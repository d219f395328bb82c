"""Ad-hoc min-of-N timer for named catalog queries at one SF dir.

Usage: python tools/time_queries.py [sf_dir] name [name ...]
       (sf_dir defaults to /root/testdata/sf0.1; N via $REPEATS, default 3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    repeats = int(os.environ.get("REPEATS", "3"))

    from sequencing_integration_pipeline1_0_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("time_queries")
    qs = entrymod.queries()
    for t in ("orders", "lineitem", "customer", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()

    for name in args:
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(runs)} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
