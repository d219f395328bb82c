"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on sf0.001 (SURVEY §3.1 spine)
queries()      -> named operator queries from SURVEY §2 (catalog)
oracle_sql()   -> DuckDB-equivalent SQL per query for the value-hash gate
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sequencing_integration_pipeline1_0_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.entry_flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(catalog.Q)


def oracle_sql() -> dict[str, str]:
    return dict(catalog.ORACLE)
