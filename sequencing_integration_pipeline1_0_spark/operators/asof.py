"""As-of (nearest-prior-event) join — a temporal operator Spark lacks
natively, re-expressed scalably (SURVEY north-star extension;
generalizes the reference's closest-date argmin selection W4,
SGTF_template_matching.Rmd:449-466, from bounded windows to
unbounded "latest state as of t" semantics).

Implementation is the union-merge form, NOT a range theta-join: tag
both sides, union, and carry the right side's values forward with
last(ignorenulls) over a (key-partitioned, time-ordered) running
window. One shuffle on the join key, linear scan per partition —
survives any scale where a per-key sort does; a range cross join
would explode on hot keys.

Determinism: right rows must be unique per (key, ts) — enforce with a
dedup pass first (dedup.dedup_first) — and right rows sort before
left rows at equal ts, so a left row at exactly t matches the right
row at t (the conventional ASOF >= semantics; DuckDB's native
ASOF JOIN, used as the test oracle, agrees).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *,
              on: Sequence[str], ts: str,
              right_value_cols: Sequence[str],
              matched_ts_col: str = "matched_ts",
              how: str = "inner") -> DataFrame:
    """For every left row, attach `right_value_cols` from the latest
    right row with right.ts <= left.ts and equal `on` keys.

    Both frames must name the time column `ts` (microsecond epoch or
    any orderable type). `how` is 'inner' (drop left rows with no prior
    right row) or 'left' (keep them with nulls)."""
    on = list(on)
    right_value_cols = list(right_value_cols)
    # pack the right row's payload into ONE struct: the struct is
    # non-null on every right row, so last(ignorenulls) stops at the
    # matched row even when an individual value column is null there
    # (per-column fills would skip past it to an older row — wrong)
    payload = F.struct(F.col(ts).alias("__ts"),
                       *[F.col(c) for c in right_value_cols])
    lt = left.withColumn("__is_left", F.lit(1))
    rt = (right.withColumn("__is_left", F.lit(0))
               .withColumn("__rpay", payload)
               .select(*on, ts, "__is_left", "__rpay"))
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (Window.partitionBy(*on)
               .orderBy(F.col(ts).asc(), F.col("__is_left").asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (u.withColumn("__rpay", F.last(F.col("__rpay"), ignorenulls=True).over(w))
               .filter(F.col("__is_left") == 1))
    out = filled.select(
        *left.columns,
        *[F.col("__rpay").getField(c).alias(c) for c in right_value_cols],
        F.col("__rpay").getField("__ts").alias(matched_ts_col))
    if how == "inner":
        out = out.filter(F.col(matched_ts_col).isNotNull())
    return out
