"""Unit tests for the scalar Column builders (SURVEY §2.7)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sequencing_integration_pipeline1_0_spark.functions import (
    accession as acc,
    cleaning,
    dates,
    vocab,
)


def _one(df, col):
    return df.select(col.alias("x")).collect()[0]["x"]


def test_normalize_na(spark):
    df = spark.createDataFrame(
        [("NA",), ("N/A",), ("None",), ("",), ("  NONE ",), ("real",)], "v string")
    out = df.select(cleaning.normalize_na("v").alias("v")).collect()
    assert [r["v"] for r in out] == [None, None, None, None, None, "real"]


def test_annihilate_chain(spark):
    # quality_filters.R:5-14: strip punct -> trim -> drop trailing
    # initial -> remove spaces -> upper
    df = spark.createDataFrame(
        [("smith-jones, jane q",), ("  O'Brien  ",), ("Lee",)], "n string")
    out = [r["x"] for r in df.select(cleaning.annihilate("n").alias("x")).collect()]
    assert out == ["SMITHJONESJANE", "OBRIEN", "LEE"]


def test_name_concat_na_safe(spark):
    df = spark.createDataFrame([("JANE", None), ("A", "B")], "f string, l string")
    out = [r["x"] for r in df.select(
        cleaning.name_concat("f", "l").alias("x")).collect()]
    assert out == ["JANE", "A_B"]  # unite(na.rm=TRUE) semantics


def test_strip_prefix(spark):
    df = spark.createDataFrame([("hCoV-19/USA/WA-X/2021",), ("USA/WA-Y/2021",)],
                               "a string")
    out = [r["x"] for r in df.select(cleaning.strip_prefix("a").alias("x")).collect()]
    assert out == ["USA/WA-X/2021", "USA/WA-Y/2021"]


def test_parse_date_multi_formats(spark):
    df = spark.createDataFrame(
        [("03/07/1995",), ("1995-3-7",), ("44287",), ("2021-04-01T10:00:00Z",),
         ("garbage",), ("99",)], "d string")
    out = [r["x"] for r in df.select(dates.parse_date_multi("d").alias("x")).collect()]
    assert out[0] == datetime.date(1995, 3, 7)
    assert out[1] == datetime.date(1995, 3, 7)
    assert out[2] == datetime.date(2021, 4, 1)   # Excel serial, origin 1899-12-30
    assert out[3] == datetime.date(2021, 4, 1)   # ISO datetime with T/Z
    assert out[4] is None
    assert out[5] is None                        # below Excel-serial range guard


def test_date_roundtrip_check(spark):
    df = spark.createDataFrame([("3/7/1995",), ("03/07/1995",), ("1995-03-07",)],
                               "d string")
    out = [r["x"] for r in df.select(dates.date_roundtrip_ok("d").alias("x")).collect()]
    # 'M/d/yyyy' renders without zero-pad: only the first round-trips
    assert out == [True, False, False]


def test_render_mdY(spark):
    df = spark.createDataFrame([(datetime.date(2021, 4, 1),)], "d date")
    assert _one(df, dates.render_mdY("d")) == "04/01/2021"


def test_within_days(spark):
    df = spark.createDataFrame(
        [(datetime.date(2021, 1, 1), datetime.date(2021, 1, 15)),
         (datetime.date(2021, 1, 1), datetime.date(2021, 1, 16))],
        "a date, b date")
    out = [r["x"] for r in df.select(dates.within_days("a", "b", 14).alias("x")).collect()]
    assert out == [True, False]


def test_accession_validation(spark):
    df = spark.createDataFrame(
        [("USA/WA-CDC-123/2021",), ("hCoV-19/USA/WA-X/2022",), ("nope",)], "a string")
    out = [r["x"] for r in df.select(acc.is_sequence_accession("a").alias("x")).collect()]
    assert out == [True, True, False]


def test_split_gisaid_id(spark):
    df = spark.createDataFrame([("hCoV-19/USA/WA-CDC-123-456/2021",)], "a string")
    parts = acc.split_gisaid_id("a")
    row = df.withColumns(parts).collect()[0]
    assert row["acc_state"] == "WA"
    assert row["acc_year"] == "2021"
    assert row["acc_middle"] == "CDC-123-456"
    assert row["acc_digit_runs"] == ["123", "456", "2021"]


def test_standardize_by_contains(spark):
    df = spark.createDataFrame(
        [("Aegis Sciences Corporation",), ("University Of Washington Medical",),
         ("Unknown Lab",)], "lab string")
    out = [r["x"] for r in df.select(
        vocab.standardize_by_contains("lab").alias("x")).collect()]
    assert out == ["Aegis", "UW Virology", "Unknown Lab"]


def test_remap_exact(spark):
    df = spark.createDataFrame(
        [("COMPLETED {1822}",), ("failed {1823}",), ("PENDING",)], "s string")
    out = [r["x"] for r in df.select(
        vocab.remap_exact("s", vocab.STATUS_ALIASES).alias("x")).collect()]
    assert out == ["COMPLETE", "FAILED", "PENDING"]


def test_notes_template(spark):
    df = spark.createDataFrame([("BA.2",)], "lin string")
    x = _one(df, vocab.notes_template("lin", F.lit("2023-01-15").cast("date")))
    assert x == ("Lineage identified as BA.2 on 2023-01-15. "
                 "Lineage assignments may change over time.")


def test_epiweek_known_mmwr_boundaries(spark):
    """MMWR epiweek against published boundary cases: weeks start
    Sunday, week 1 contains Jan 4, year-end days belong to week 52/53
    of the epi year of their week's Wednesday."""
    from sequencing_integration_pipeline1_0_spark.functions import dates
    cases = [
        ("2021-01-02", 53),  # Saturday of the week of 2020-12-27 -> W53/2020
        ("2021-01-03", 1),   # Sunday starting MMWR week 1 of 2021
        ("2021-01-04", 1),
        ("2024-01-01", 1),   # Jan 4 2024 is Thu; W1 starts 2023-12-31
        ("2023-12-31", 1),   # Sunday opening 2024's week 1
        ("2023-12-30", 52),  # last Saturday of 2023's week 52
        ("2022-07-06", 27),
    ]
    df = spark.createDataFrame([(d,) for d, _ in cases], "d string") \
              .withColumn("d", F.col("d").cast("date"))
    got = {r["d"].isoformat(): r["w"]
           for r in df.withColumn("w", dates.epiweek("d")).collect()}
    for d, want in cases:
        assert got[d] == want, f"{d}: got {got[d]}, want {want}"
    # week bounds: Sunday start, Saturday end
    b = df.select(
        dates.epi_week_start("d").alias("ws")).collect()
    import datetime
    assert all(r["ws"].weekday() == 6 for r in b)  # python: Sunday == 6
