"""Ingestion (SURVEY §2.1 S1-S7).

Reference contract: every file is read ALL-STRING with a curated
NA-string vocabulary and a per-row provenance column
(ROSTER_COMPILE.Rmd:121-157, fuzzy.Rmd:97-155); extension-dispatched
polyglot reader with corrupt-file tolerance (read_all_data.Rmd:51-64).

Spark-first: one spark.read over the whole path list (NOT a Python loop
of unions — a thousand-file queue is one scan with partition-parallel
reads), provenance via input_file_name(), corrupt rows tolerated via
PERMISSIVE + columnNameOfCorruptRecord.
"""

from __future__ import annotations

import os
from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.cleaning import NA_STRINGS, normalize_na_df


def read_csv_allstring(spark: SparkSession, paths: Sequence[str] | str, *,
                       header: bool = True, sep: str = ",",
                       na_strings: Iterable[str] = NA_STRINGS,
                       provenance: str | None = "index",
                       schema: T.StructType | None = None,
                       corrupt_col: str | None = "_corrupt_record") -> DataFrame:
    """S1/S3: all-string CSV/TSV scan (+ .gz auto codec), NA vocabulary
    normalized to NULL, provenance column = source file path.

    The reference names its provenance column `index`
    (ROSTER_COMPILE.Rmd:135-157 map_df(.id='index'))."""
    reader = (spark.read
              .option("header", header)
              .option("sep", sep)
              .option("mode", "PERMISSIVE"))
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", False)  # all columns -> string
    if corrupt_col and schema is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    df = reader.csv(list(paths) if not isinstance(paths, str) else paths)
    if provenance:
        df = df.withColumn(provenance, F.input_file_name())
    exclude = {provenance} if provenance else set()
    df = normalize_na_df(df, [c for c in df.columns
                              if c not in exclude and c != corrupt_col],
                         na_strings)
    return df


def read_parquet(spark: SparkSession, path: str,
                 provenance: str | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    if provenance:
        df = df.withColumn(provenance, F.input_file_name())
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: Sequence[str] = ("region", "nation", "customer", "supplier",
                                        "part", "orders", "lineitem", "events",
                                        "documents", "embeddings")) -> dict[str, DataFrame]:
    """Load the driver testdata star schema (TESTDATA.md)."""
    out = {}
    for n in names:
        p = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(p):
            out[n] = spark.read.parquet(p)
    return out


#: S6 reader registry keyed on extension; xlsx handled via pandas since
#: Spark has no native xlsx source (SURVEY S2) — used only off the hot path.
def read_any(spark: SparkSession, path: str, **kw) -> DataFrame:
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext in ("csv", "txt"):
        return read_csv_allstring(spark, path, **kw)
    if ext in ("tsv", "tab"):
        return read_csv_allstring(spark, path, sep="\t", **kw)
    if ext == "gz":  # e.g. metadata.tsv.gz
        inner = os.path.splitext(os.path.splitext(path)[0])[1].lstrip(".")
        return read_csv_allstring(spark, path, sep="\t" if inner in ("tsv", "tab") else ",", **kw)
    if ext == "parquet":
        return read_parquet(spark, path)
    if ext in ("xlsx", "xls"):
        try:
            import pandas as pd
            pdf = pd.read_excel(path, dtype=str)
            return spark.createDataFrame(pdf)
        except ImportError as e:  # openpyxl not installed in this container
            raise NotImplementedError(f"xlsx reader unavailable: {e}") from e
    raise ValueError(f"unsupported extension: {path}")


def latest_file_per_dir(spark: SparkSession, root: str,
                        pattern: str = "*") -> DataFrame:
    """S7: directory-glob discovery with latest-by-mtime selection per
    dir (phl.Rmd:116-133), expressed as a file-listing DataFrame +
    window argmax so it scales to millions of queue files."""
    import glob as _glob
    rows = []
    for p in _glob.glob(os.path.join(root, "**", pattern), recursive=True):
        if os.path.isfile(p):
            rows.append((os.path.dirname(p), p, float(os.path.getmtime(p))))
    schema = "dir string, path string, mtime double"
    df = spark.createDataFrame(rows, schema=schema)
    from ..operators.aggregates import latest_per_group
    return latest_per_group(df, ["dir"], "mtime")
