"""Hand-value tests for the mergeable sketches (HLL, Count-Min) and
the Z-order layout planner."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sequencing_integration_pipeline1_0_spark.operators import layout as lay
from sequencing_integration_pipeline1_0_spark.operators import sketches as sk


def _py_md5_60bit(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_hll(h: int) -> tuple[int, int]:
    reg = h & (sk.HLL_M - 1)
    w = h >> sk.HLL_P
    rank = sk.HLL_RANK_MAX if w == 0 else sk.HLL_RANK_MAX - w.bit_length()
    return reg, rank


def test_hll_registers_match_python_mirror(spark):
    keys = ["7", "42", "123456", "0", "999999999"]
    df = spark.createDataFrame([(int(k),) for k in keys], ["k"])
    got = {(r.reg, r.mj)
           for r in sk.hll_registers(df, F.col("k")).collect()}
    exp_per_key = [_py_hll(_py_md5_60bit(k)) for k in keys]
    exp: dict[int, int] = {}
    for reg, rank in exp_per_key:
        exp[reg] = max(exp.get(reg, 0), rank)
    assert got == set(exp.items())


def test_hll_distinct_merge_identity_and_band(spark):
    # 600 distinct keys, each duplicated, across 3 shards
    rows = [(i % 600, f"g{i % 3}") for i in range(1200)]
    df = spark.createDataFrame(rows, ["k", "g"])
    out = sk.hll_distinct(df, "k", "g").collect()
    assert len(out) == 1
    r = out[0]
    assert r.merge_exact == 1
    assert r.est == r.est_merged
    assert r.exact_distinct == 600
    # m=256 -> expected relative error ~1.04/sqrt(256) = 6.5%; allow 4x
    assert abs(r.rel_err_pct) < 26.0


def test_cms_estimates_never_undercount(spark):
    docs = [("a b b c c c d d d d",), ("a c d",), ("e",)]
    df = spark.createDataFrame(docs, ["text"])
    out = {r.word: r for r in sk.cms_heavy_hitters(df, "text").collect()}
    exact = {"a": 2, "b": 2, "c": 4, "d": 5, "e": 1}
    assert {w: r.exact_cnt for w, r in out.items()} == exact
    assert all(r.cms_est >= r.exact_cnt for r in out.values())
    assert all(r.overest == r.cms_est - r.exact_cnt for r in out.values())
    # rnk is the (count desc, word asc) order
    assert [r.word for r in sorted(out.values(), key=lambda r: r.rnk)] == \
        ["d", "c", "a", "b", "e"]


def test_z_interleave_hand_values(spark):
    # x=3 (bits at 0,2), y=1 (bit at 1) -> 0b111 = 7
    df = spark.createDataFrame([(3, 1), (0, 0), (1, 0), (0, 1), (5, 2)],
                               ["x", "y"])
    expr = lay.z_interleave_sql("x", "y", engine="spark")
    got = [r.z for r in
           df.select(F.expr(expr).alias("z")).orderBy("z").collect()]

    def py_z(x: int, y: int) -> int:
        z = 0
        for b in range(lay.ZORDER_BITS):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == sorted(py_z(x, y) for x, y in
                         [(3, 1), (0, 0), (1, 0), (0, 1), (5, 2)])


def test_zorder_layout_invariants(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    res = lay.zorder_file_stats(orders).collect()
    by_layout: dict[str, list] = {}
    for r in res:
        by_layout.setdefault(r.layout, []).append(r)
    assert set(by_layout) == {"zorder", "orderkey"}
    for rows in by_layout.values():
        assert sum(r.n_rows for r in rows) == n
        # every file except possibly the last is exactly full
        sizes = [r.n_rows for r in sorted(rows, key=lambda r: r.file_id)]
        assert all(s == lay.ZORDER_ROWS_PER_FILE for s in sizes[:-1])
        assert all(r.min_cust <= r.max_cust and r.min_day <= r.max_day
                   for r in rows)
    scanned = {k: sum(r.scanned for r in v) for k, v in by_layout.items()}
    assert scanned["zorder"] <= scanned["orderkey"]


def test_write_zordered_real_file_envelopes(spark, sf_dir, tmp_path):
    """The production z-ordered parquet write produces real files
    whose min/max envelopes prune the ZBOX predicate better than a
    single-key-ordered write of the same rows."""
    from sequencing_integration_pipeline1_0_spark.sources import sinks

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = orders.selectExpr(
        "o_orderkey",
        f"o_custkey & {lay.ZORDER_MASK} as x",
        f"CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT)"
        f" & {lay.ZORDER_MASK} as y")
    zpath, kpath = str(tmp_path / "z"), str(tmp_path / "k")
    sinks.write_zordered(base, zpath,
                         lay.z_interleave_sql("x", "y", engine="spark"),
                         n_files=6)
    (base.repartitionByRange(6, F.col("o_orderkey"))
         .sortWithinPartitions("o_orderkey").write.parquet(kpath))

    def scanned_files(path: str) -> tuple[int, int]:
        env = (spark.read.parquet(path)
               .groupBy(F.input_file_name().alias("f"))
               .agg(F.min("x").alias("min_c"), F.max("x").alias("max_c"),
                    F.min("y").alias("min_d"), F.max("y").alias("max_d"))
               .collect())
        hit = sum(1 for r in env
                  if r.min_c <= lay.ZBOX_CUST_HI
                  and r.max_c >= lay.ZBOX_CUST_LO
                  and r.min_d <= lay.ZBOX_DAY_HI
                  and r.max_d >= lay.ZBOX_DAY_LO)
        return hit, len(env)

    zhit, ztot = scanned_files(zpath)
    khit, ktot = scanned_files(kpath)
    # same rows landed in both layouts
    assert spark.read.parquet(zpath).count() == base.count()
    assert ztot >= 6 and ktot >= 6
    # the box predicate touches strictly fewer z-ordered files
    assert zhit < khit
    # and Spark's own min/max pruning agrees: a filtered read of the
    # z-ordered table returns exactly the box rows
    got = (spark.read.parquet(zpath)
           .where((F.col("x").between(lay.ZBOX_CUST_LO, lay.ZBOX_CUST_HI))
                  & (F.col("y").between(lay.ZBOX_DAY_LO, lay.ZBOX_DAY_HI)))
           .count())
    exp = (base.where((F.col("x").between(lay.ZBOX_CUST_LO,
                                          lay.ZBOX_CUST_HI))
                      & (F.col("y").between(lay.ZBOX_DAY_LO,
                                            lay.ZBOX_DAY_HI)))
           .count())
    assert got == exp


def test_hll_set_algebra_union_and_intersection(spark):
    # A = evens 0..399 (200 keys), B = multiples of 3 in 0..599
    # (200 keys), |A ∩ B| = multiples of 6 in 0..399 = 67
    rows = [(i,) for i in range(600)]
    df = spark.createDataFrame(rows, ["k"])
    out = sk.hll_set_algebra(
        df, F.col("k"),
        (F.col("k") % 2 == 0) & (F.col("k") < 400),
        F.col("k") % 3 == 0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.exact_a, r.exact_b, r.exact_intersect) == (200, 200, 67)
    assert r.exact_union == 333
    # inclusion-exclusion identity holds on the rounded estimates
    assert abs(r.est_intersect - (r.est_a + r.est_b - r.est_union)) < 1e-9
    # estimates within 4x the 6.5% expected band
    assert abs(r.est_a - 200) / 200 < 0.26
    assert abs(r.est_union - 333) / 333 < 0.26


def test_histogram_quantiles_hand_values(spark):
    # uniform 0..999: p50 ~ 499.5 exact; histogram est close
    df = spark.createDataFrame([(float(i),) for i in range(1000)], ["v"])
    out = {r.q: r for r in sk.histogram_quantiles(df, "v").collect()}
    assert set(out) == {0.5, 0.9, 0.99}
    assert out[0.5].exact == 499.5
    for r in out.values():
        assert abs(r.est - r.exact) <= 1000 / sk.HIST_BUCKETS


def test_histogram_quantiles_constant_column(spark):
    df = spark.createDataFrame([(7.0,)] * 50, ["v"])
    out = sk.histogram_quantiles(df, "v").collect()
    assert all(r.est == 7.0 and r.exact == 7.0 for r in out)
