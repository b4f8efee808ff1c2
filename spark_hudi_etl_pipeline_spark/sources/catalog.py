"""Fixture-table catalog (reference S1/S2, pipeline_architecture.py:131-138,
:177, :217).

The reference reads catalog-managed Hudi tables via ``spark.sql("… FROM
db.tbl")``. In this harness the same tables are parquet files under a
scale-factor directory; ``register_views`` gives every query the identical
``FROM name`` surface. A parquet scan through Catalyst gets predicate
pushdown, column pruning, and (on partitioned layouts) partition pruning
for free — at 100 TB the only change is the path pointing at an object
store and the files being partitioned/clustered, not any query code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The driver-generated star schema + events/documents/embeddings
#: (TESTDATA.md / FIXTURES.md §B).
FIXTURE_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Lazy; Catalyst prunes columns/predicates."""
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {FIXTURE_TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); the session reads it as
        # raw nanos (spark.sql.legacy.parquet.nanosAsLong) — normalize to
        # TimestampType (µs, truncating like DuckDB's ns→µs cast).
        # `div` (integer division) keeps full precision; a double detour
        # would corrupt epoch-nanos (> 2^53).
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture as a temp view so SQL-surface queries can use
    the reference's ``FROM table`` form (reference :217, :357)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
