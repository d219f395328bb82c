"""Docs stay truthful: every query name PARITY.md/README.md claim
exists must exist in __spark_entry__.queries(), and every registered
query must appear in PARITY.md (no silent coverage gaps either way)."""

from __future__ import annotations

import re

import __spark_entry__ as entrymod

QUERY_RE = re.compile(r"`([a-z][a-z0-9_]+)`")


def test_parity_md_names_exist_and_complete():
    qs = set(entrymod.queries())
    text = open("PARITY.md").read()
    claimed = {m for m in QUERY_RE.findall(text) if m in qs or "_" in m}
    # names that look like query ids (start with a registered prefix)
    prefixes = ("s1", "s5", "s11", "p", "j", "a", "w", "u", "f", "qa_",
                "t", "dedup_", "ann_", "text_", "mm_", "skew_", "fuzzy_",
                "x_", "pipe_")
    looks_like_query = {m for m in claimed
                        if m in qs or any(m.startswith(p) for p in prefixes)}
    lib_names = {  # library functions, not queries — allowed
        m for m in looks_like_query
        if "." in m or m in qs}
    missing = {m for m in looks_like_query - qs
               if re.fullmatch(r"(s\d+|p\d+|j\d+|a\d+b?|w\d+|u\d+|f\d+|t\d+"
                               r"|qa|dedup|ann|text|mm|skew|fuzzy|x|pipe)_.*", m)}
    assert not missing, f"PARITY.md names not in queries(): {sorted(missing)}"
    unlisted = qs - claimed
    assert not unlisted, f"queries() not mentioned in PARITY.md: {sorted(unlisted)}"
