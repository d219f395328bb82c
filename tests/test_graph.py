"""Hand-value tests for the iterative graph analytics operators."""

from __future__ import annotations

from sequencing_integration_pipeline1_0_spark.operators import graph


def test_pagerank_cycle_is_uniform(spark):
    # on a directed 3-cycle every node keeps exactly 1/3
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], ["src", "dst"])
    out = {r.node: r.pr for r in graph.pagerank(e).collect()}
    assert set(out) == {0, 1, 2}
    assert all(abs(v - 1 / 3) < 1e-9 for v in out.values())


def test_pagerank_hub_attracts_mass(spark):
    # bidirectional star: the hub ends with more rank than any leaf,
    # leaves are symmetric, and total mass stays ~1 (no dangling nodes)
    edges = [(i, 0) for i in (1, 2, 3)] + [(0, i) for i in (1, 2, 3)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r.pr for r in graph.pagerank(e).collect()}
    assert out[0] > out[1]
    assert out[1] == out[2] == out[3]
    assert abs(sum(out.values()) - 1.0) < 1e-6


def test_fellegi_sunter_weights_and_threshold(spark):
    import math

    from pyspark.sql import functions as F

    from sequencing_integration_pipeline1_0_spark.operators import fuzzy

    w = fuzzy.fs_weights()
    # weights are ln(m/u) of the module priors
    assert w["name"][2] == math.log(fuzzy.FS_NAME_M[2] / fuzzy.FS_NAME_U[2])
    # full agreement scores w_name2 + w_seg1 + w_bal1 and clears the
    # threshold; full disagreement lands far below it
    df = spark.createDataFrame([(2, 1, 1), (0, 0, 0)],
                               ["gn", "gs", "gb"])
    out = (df.select(fuzzy.fellegi_sunter_score(
               F.col("gn"), F.col("gs"), F.col("gb")).alias("s"))
             .collect())
    hi, lo = max(r.s for r in out), min(r.s for r in out)
    assert abs(hi - round(w["name"][2] + w["seg"][1] + w["bal"][1], 6)) == 0
    assert abs(lo - round(w["name"][0] + w["seg"][0] + w["bal"][0], 6)) == 0
    assert hi >= fuzzy.FS_THRESHOLD > lo


def test_tfidf_cosine_identical_docs_score_one(spark):
    from sequencing_integration_pipeline1_0_spark.operators import textstats
    docs = [(1, "apple banana cherry"), (2, "apple banana cherry"),
            (3, "zebra yak xylophone"), (4, "apple zebra unrelated")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {(r.doc_a, r.doc_b): r.cos_sim
           for r in textstats.tfidf_cosine_topk(
               df, maxdf_frac=1.0, threshold=0.0).collect()}
    # identical docs: cosine exactly 1; disjoint docs never pair
    assert out[(1, 2)] == 1.0
    assert (1, 3) not in out and (2, 3) not in out
    # partial overlap scores strictly between 0 and 1
    assert 0.0 < out[(1, 4)] < 1.0


def test_benford_digits_partition_and_sum(spark):
    from pyspark.sql import functions as F

    from sequencing_integration_pipeline1_0_spark.operators import qa

    # values with known leading digits (of cents): 1.23 -> 123 -> 1,
    # 9.99 -> 999 -> 9, 0.05 -> 5 -> 5, 20.0 -> 2000 -> 2;
    # 0.004 rounds to 0 cents (sub-cent positive: must be DROPPED,
    # not crash element_at with digit 0)
    df = spark.createDataFrame(
        [(1.23,), (9.99,), (0.05,), (20.0,), (-3.0,), (0.0,), (0.004,)],
        ["v"])
    out = {r.digit: r for r in qa.benford_first_digit(df, "v").collect()}
    assert set(out) == set(range(1, 10))     # all 9 digits materialized
    seen = {1, 9, 5, 2}
    assert all(out[d].observed == (1 if d in seen else 0)
               for d in range(1, 10))
    n = sum(r.observed for r in out.values())
    assert n == 4                            # nonpositive + sub-cent dropped
    probs = qa.benford_probs()
    for d, r in out.items():
        assert r.expected == round(probs[d - 1] * n, 6)
        assert r.chi2_contrib >= 0
        if r.observed == 0:                  # absent digit carries full term
            assert r.chi2_contrib == round(probs[d - 1] * n, 6)
