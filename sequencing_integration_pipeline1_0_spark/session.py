"""SparkSession factory tuned for the engine.

Local-mode testing runs on local[N]; the configs are chosen so the same
logical plans scale to a multi-executor cluster: AQE on (runtime
coalesce + skew-join handling — e.g. dense DOB-year blocks in the fuzzy
join), shuffle partitions sized to the parallelism, Arrow enabled for
the (rare) pandas exchanges.

ANSI note: Spark 4 enables spark.sql.ansi.enabled by default, which
turns bad casts into runtime errors. The reference's semantics are
"dirty strings parse to NULL" (SURVEY §1.2), so every parse in this
package uses try_* forms (try_to_date/try_to_timestamp/try_cast) and
works under either ANSI setting.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sequencing_integration_pipeline1_0_spark",
              cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS") or 0) or (os.cpu_count() or 8)
    if shuffle_partitions is None:
        shuffle_partitions = cores
    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
