"""Testdata schema-drift canary (runs first: fails fast with the drifted
column named, instead of 15 opaque UNRESOLVED_COLUMN failures downstream).

Round 2 burned the bench + 10 queries when the driver regenerated
/root/testdata and events.ts silently changed from TIMESTAMP(NANOS) to
timestamp[us]. The loader (plans/catalog._t) is now robust to both, but any
FUTURE drift should be announced here, not discovered in a window spec.

Pure pyarrow — no SparkSession needed, so this runs in milliseconds.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

# column -> set of acceptable arrow dtypes (str). Multiple entries mean the
# loaders are known-robust to each physical variant.
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {"n_nationkey": {"int32"}, "n_name": {"string", "large_string"},
               "n_regionkey": {"int32"}},
    "customer": {"c_custkey": {"int64"}, "c_name": {"string", "large_string"},
                 "c_nationkey": {"int32"}, "c_acctbal": {"double"},
                 "c_mktsegment": {"string", "large_string"}},
    "supplier": {"s_suppkey": {"int64"}, "s_name": {"string", "large_string"},
                 "s_nationkey": {"int32"}, "s_acctbal": {"double"}},
    "part": {"p_partkey": {"int64"}, "p_name": {"string", "large_string"},
             "p_brand": {"string", "large_string"},
             "p_type": {"string", "large_string"}, "p_size": {"int32"},
             "p_retailprice": {"double"}},
    "orders": {"o_orderkey": {"int64"}, "o_custkey": {"int64"},
               "o_orderstatus": {"string", "large_string"},
               "o_totalprice": {"double"},
               "o_orderdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
               "o_orderpriority": {"string", "large_string"}},
    "lineitem": {"l_orderkey": {"int64"}, "l_partkey": {"int64"},
                 "l_suppkey": {"int64"}, "l_linenumber": {"int32"},
                 "l_quantity": {"double"}, "l_extendedprice": {"double"},
                 "l_discount": {"double"}, "l_tax": {"double"},
                 "l_returnflag": {"string", "large_string"},
                 "l_linestatus": {"string", "large_string"},
                 "l_shipdate": {"timestamp[us]", "timestamp[ns]",
                                "date32[day]"}},
    "events": {"event_id": {"int64"},
               # both variants seen in the wild; catalog._t normalizes each
               # to a bigint ts_us column
               "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
               "user_id": {"int64"},
               "event_type": {"string", "large_string"}, "value": {"double"},
               "props": {"string", "large_string"}},
    "documents": {"doc_id": {"int64"}, "text": {"string", "large_string"},
                  "lang": {"string", "large_string"},
                  "source": {"string", "large_string"}, "n_chars": {"int64"}},
    "embeddings": {"vec_id": {"int64"},
                   "embedding": {"list<element: float>",
                                 "list<item: float>"},
                   "label": {"int32"}},
}


def _sf_dirs():
    dirs = sorted(glob.glob("/root/testdata/sf*"))
    return dirs or pytest.skip("no testdata present")


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_testdata_schema_unchanged(table):
    problems = []
    for d in _sf_dirs():
        path = os.path.join(d, f"{table}.parquet")
        if not os.path.exists(path):
            problems.append(f"{path}: MISSING table")
            continue
        schema = pq.read_schema(path)
        have = {n: str(schema.field(n).type) for n in schema.names}
        for col, allowed in EXPECTED[table].items():
            if col not in have:
                problems.append(f"{path}: column `{col}` DISAPPEARED")
            elif have[col] not in allowed:
                problems.append(
                    f"{path}: column `{col}` DRIFTED to {have[col]} "
                    f"(loader tested against {sorted(allowed)})")
        for col in have:
            if col not in EXPECTED[table]:
                problems.append(f"{path}: NEW column `{col}` ({have[col]})")
    assert not problems, (
        "TESTDATA SCHEMA DRIFT — the driver regenerated /root/testdata with "
        "a different schema. Audit loaders (plans/catalog._t, oracle SQL) "
        "before trusting any other failure in this run:\n  "
        + "\n  ".join(problems))
