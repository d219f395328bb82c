"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations


def test_entry_runs(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"route", "o_orderstatus", "n"}


def test_queries_and_oracles_aligned():
    import __spark_entry__ as e
    qs = e.queries()
    oracles = e.oracle_sql()
    assert qs, "no queries registered"
    for name in oracles:
        assert name in qs, f"oracle {name} has no query"


def test_all_queries_run_sf0001(spark, sf_dir):
    import __spark_entry__ as e
    for name, fn in e.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
