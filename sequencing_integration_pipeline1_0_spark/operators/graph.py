"""Iterative graph analytics: PageRank power iteration (SURVEY
north-star extension; the graph sibling of dedup_cluster_canonical's
pointer-jumping connected components, operators/dedupe_scale.py:556).

Why a corpus engine ships PageRank: production training-data
pipelines weight crawl sampling by link authority (host- or
domain-level PageRank over the web graph is a standard corpus-quality
signal — the reason Common Crawl publishes host-level rank data).
The operator here is the same computation over any (src, dst) edge
DataFrame.

Determinism: per-edge contributions are IEEE doubles rounded to
1e-12 and SUMMED AS DECIMALS (order-free partial aggregation); the
teleport base and the final per-iteration value are single rounded
double ops mirrored token-for-token by the SQL oracle. The iteration
count is a fixed unroll (the quality_logreg_train precedent:
3 iterations = one Catalyst plan, no driver loop)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: standard damping factor and the fixed unroll depth
PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 3


def pagerank(edges: DataFrame, *, iters: int = PAGERANK_ITERS,
             damping: float = PAGERANK_DAMPING,
             round_to: int = 12) -> DataFrame:
    """Fixed-iteration PageRank over a directed (src, dst) edge
    table. Returns (node, pr) for every node appearing as a src or
    dst. PR_{t+1}(v) = (1-d)/N + d * sum_{u->v} PR_t(u)/outdeg(u);
    dangling nodes (no out-edges) keep receiving teleport mass and
    contribute none — the plain power-iteration convention,
    documented rather than silently redistributed.

    Scale shape per iteration: one shuffle join of the slim rank
    table onto edges by src (at web scale: pre-partition both by src
    so the join is co-located), one groupBy(dst) with map-side
    combine over decimal contributions, one left join back onto the
    node table for teleport-only nodes. Plan size grows linearly in
    `iters` (fixed unroll, one declarative plan — at hundreds of
    iterations checkpoint the rank table per round instead)."""
    e = edges.select(F.col("src").cast("long").alias("src"),
                     F.col("dst").cast("long").alias("dst")).distinct()
    nodes = (e.select(F.col("src").alias("node"))
              .unionByName(e.select(F.col("dst").alias("node")))
              .distinct())
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    # every node carries n_nodes so the teleport term needs no
    # rejoin per iteration (1-row broadcast, attached once)
    pr = (nodes.crossJoin(F.broadcast(n))
               .select("node", "n_nodes",
                       F.round(F.lit(1.0) / F.col("n_nodes"), round_to)
                        .alias("pr")))
    base = F.round(F.lit(1.0 - damping) / F.col("n_nodes"), round_to)
    for _ in range(iters):
        contrib = (pr.join(e, pr["node"] == e["src"])
                     .join(F.broadcast(outdeg), "src")
                     .select(F.col("dst"),
                             F.round(F.lit(damping) * F.col("pr")
                                     / F.col("outdeg"), round_to)
                              .cast("decimal(38,12)").alias("c")))
        inmass = contrib.groupBy("dst").agg(F.sum("c").alias("m"))
        pr = (pr.join(inmass, pr["node"] == inmass["dst"], "left")
                .select("node", "n_nodes",
                        F.round(base + F.coalesce(
                            F.col("m").cast("double"), F.lit(0.0)),
                            round_to).alias("pr")))
    return pr.select("node", "pr")
