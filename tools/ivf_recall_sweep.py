"""IVF recall/latency sweep: recall@5 vs brute force across nprobe
(the probe-breadth lever) for the k-means-trained codebook, at sf0.01.

Writes tools/ivf_sweep_results.json; tools/scale_probe.py embeds the
table in SCALING.md on its next run (single source for the doc).

Usage: python tools/ivf_recall_sweep.py  (~2-3 min; run nothing else)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
NPROBES = [1, 2, 3, 4, 6, 8]
N_CELLS = 8


def main() -> None:
    from pyspark.sql import functions as F

    from sequencing_integration_pipeline1_0_spark.operators import similarity
    from sequencing_integration_pipeline1_0_spark.plans.catalog import _t
    from sequencing_integration_pipeline1_0_spark.session import get_spark

    spark = get_spark("ivf_recall_sweep")
    e = _t(spark, SF_DIR, "embeddings")
    n_vecs = e.count()

    brute = (similarity.brute_force_topk(e, "vec_id", "embedding", k=5)
             .select("id", "neighbor_id").cache())
    brute_pairs = brute.count()

    rows = []
    for nprobe in NPROBES:
        ivf = similarity.ivf_topk(e, "vec_id", "embedding", k=5,
                                  n_cells=N_CELLS, nprobe=nprobe,
                                  train_iters=2)
        # time the IVF query ALONE (full materialization via noop
        # sink, best of 2 so the published latency is the plan, not
        # warmup); the brute-force recall join is evaluation overhead
        # and must not pollute the latency column the nprobe knee is
        # read from
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            ivf.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        hits = (brute.join(ivf.select("id", "neighbor_id"),
                           ["id", "neighbor_id"], "left_semi").count())
        rows.append({"nprobe": nprobe, "recall_at_5": round(hits / brute_pairs, 4),
                     "seconds": round(best, 2)})
        print(rows[-1])

    out = {"sf_dir": SF_DIR, "n_vecs": n_vecs, "n_cells": N_CELLS,
           "train_iters": 2, "brute_pairs": brute_pairs, "sweep": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ivf_sweep_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
