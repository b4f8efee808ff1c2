"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``spark_hudi_etl_pipeline_spark.plans`` (one module
per tier); importing the package populates the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_hudi_etl_pipeline_spark.plans import ORACLES, QUERIES, ordered_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions.

    Iteration order is deliberate: the driver checks the first 50 entries,
    so ``plans.registry.PRIORITY_WINDOW`` (one representative per tier,
    rotated each round — see COVERAGE.md §Rotation) comes first."""
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys (approximation-
    bearing operators: LSH, SimHash, ANN) get rows-only checks."""
    return dict(ORACLES)
