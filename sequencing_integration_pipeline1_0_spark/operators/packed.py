"""Packed multi-value column handling (SURVEY §1.2, §4 note (c)).

WDRS FLATTENED packs multiple accessions into one comma-separated
string; consumers split+flatten (template_submitters.Rmd:175-185) or
positionally co-explode parallel columns (QA_DUPLICATES.Rmd:74-82,
QA_for_review.Rmd:143-170 separate_rows on parallel columns).

Spark: split + explode; the positional variant is
arrays_zip(split(a), split(b)) -> explode -> struct fields, preserving
positional pairing, with the length-mismatch guard the R version
silently lacks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_packed(df: DataFrame, col: str, sep: str = r",\s*",
                   out: str | None = None, keep_empty: bool = False) -> DataFrame:
    """Single-column split+flatten with per-element trim."""
    out = out or col
    arr = F.transform(F.split(F.col(col), sep), lambda x: F.trim(x))
    if not keep_empty:
        arr = F.filter(arr, lambda x: x != "")
    return df.withColumn(out, F.explode(arr))


def co_explode(df: DataFrame, cols: Sequence[str], sep: str = r",\s*",
               strict: bool = False, mismatch_flag: str = "packed_len_mismatch") -> DataFrame:
    """Positional co-explosion of parallel packed columns.

    Each input column becomes its per-position element; rows whose
    packed lists have differing lengths get NULLs for the shorter lists
    (arrays_zip semantics) and a mismatch flag — the guard the
    reference lacks. strict=True drops nothing but flags."""
    arrs = {c: F.transform(F.split(F.col(c), sep), lambda x: F.trim(x)) for c in cols}
    lens = [F.size(a) for a in arrs.values()]
    same_len = None
    for ln in lens[1:]:
        e = lens[0] == ln
        same_len = e if same_len is None else same_len & e
    tmp = (df.withColumn("__zip", F.arrays_zip(*arrs.values()))
             .withColumn(mismatch_flag, ~(same_len if same_len is not None else F.lit(True))))
    exploded = tmp.withColumn("__e", F.explode("__zip"))
    keep = [c for c in df.columns if c not in set(cols)]
    out = exploded.select(
        *keep,
        *[F.col("__e").getItem(str(i)).alias(c) for i, c in enumerate(cols)],
        F.col(mismatch_flag),
    )
    return out
