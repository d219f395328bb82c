"""One-command verification envelope (VERDICT r3 item 9): the full
local replica of everything the external driver checks, in one run.

    python tools/verify.py            # ~13 min on an idle machine
    python tools/verify.py --fast     # sf0.001 selfcheck + smoke only

Steps (each prints PASS/FAIL; exit code is the AND):
  1. selfcheck at sf0.001 (engine session)
  2. cross-engine edge-input harness (tests/test_oracle_edges.py —
     the null/empty/unicode corpus both engines must agree on; it
     has caught real bugs the shipped testdata cannot, commit
     e0e9888)
  3. selfcheck at sf0.01 with --vanilla (bare ANSI SparkSession —
     the driver's environment)
  4. entry() smoke on a vanilla session (rows > 0)
  5. bench.py at sf0.1 (one JSON line, rc=0)
--fast runs 1 + 2 + 4 only.

Run nothing else concurrently — bench/probe numbers inflate 1.5-3x
under contention (SCALING.md history).
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMOKE = (
    "import sys; sys.path.insert(0, %r)\n"
    "from pyspark.sql import SparkSession\n"
    "spark = SparkSession.builder.master('local[8]').getOrCreate()\n"
    "import __spark_entry__ as e\n"
    "n = len(e.entry(spark).collect())\n"
    "print(n, 'rows'); sys.exit(0 if n > 0 else 1)\n" % ROOT
)


def run(label: str, cmd: list[str]) -> bool:
    print(f"== {label}: {' '.join(cmd[:4])} ...", flush=True)
    r = subprocess.run(cmd, cwd=ROOT)
    print(f"== {label}: {'PASS' if r.returncode == 0 else 'FAIL'}",
          flush=True)
    return r.returncode == 0


def main() -> int:
    fast = "--fast" in sys.argv[1:]
    py = sys.executable
    ok = run("selfcheck sf0.001",
             [py, "tools/selfcheck.py", "/root/testdata/sf0.001"])
    ok &= run("edge harness",
              [py, "-m", "pytest", "tests/test_oracle_edges.py", "-q",
               "--no-header", "-x"])
    if not fast:
        ok &= run("selfcheck sf0.01 (vanilla)",
                  [py, "tools/selfcheck.py", "--vanilla",
                   "/root/testdata/sf0.01"])
    ok &= run("entry smoke", [py, "-c", SMOKE])
    if not fast:
        ok &= run("bench sf0.1", [py, "bench.py"])
    print("VERIFY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
