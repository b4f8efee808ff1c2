"""Idempotent schema bootstrap — reference R2 (`pipeline_architecture.py
:69-122`): `CREATE DATABASE IF NOT EXISTS` + keyed-table DDL.

The reference issues ``CREATE TABLE … USING HUDI TBLPROPERTIES
(type='cow', primaryKey=…, preCombineField=…)`` (:78-97, :100-117).
Without the Hudi bundle those TBLPROPERTIES are inert strings, so the
fallback DDL here uses ``USING PARQUET`` and records the key/precombine
contract in table properties anyway — `operators/merge.py` enforces the
semantics at write time, which is where they live in the fallback
architecture. With the bundle on the classpath, pass ``provider="hudi"``
and the same DDL becomes a real Hudi table (connector passthrough).

Everything is `IF NOT EXISTS`-idempotent: re-running bootstrap on a live
deployment is a no-op, the reference's operational contract.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Audit log schema per reference :100-117 (FIXTURES.md §A2).
PIPELINE_LOG_COLUMNS = """
  pipeline_name STRING,
  last_run_timestamp BIGINT,
  current_run_timestamp BIGINT,
  status STRING,
  records_processed INT,
  processing_time_seconds DOUBLE,
  error_message STRING,
  created_at BIGINT
"""


def create_database(spark: SparkSession, name: str) -> None:
    """Reference :73-74."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {quoted(name)}")


def create_keyed_table(
    spark: SparkSession,
    table: str,
    columns_ddl: str,
    *,
    primary_key: str,
    precombine_field: str,
    provider: str = "parquet",
    location: str | None = None,
) -> None:
    """Reference :78-97 / :100-117 — keyed table with the upsert contract
    declared in TBLPROPERTIES. ``provider="hudi"`` reproduces the
    reference DDL verbatim when the connector is present."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {quoted(table)} ({columns_ddl}) "
        f"USING {provider}{loc} "
        f"TBLPROPERTIES (type = 'cow', primaryKey = '{primary_key}', "
        f"preCombineField = '{precombine_field}')"
    )


def create_pipeline_log_table(
    spark: SparkSession, table: str = "pipeline_layer.pipeline_log", **kw
) -> None:
    """Reference :100-117: composite key (pipeline_name, created_at),
    precombine on created_at."""
    db = table.split(".", 1)[0] if "." in table else None
    if db:
        create_database(spark, db)
    create_keyed_table(
        spark,
        table,
        PIPELINE_LOG_COLUMNS,
        primary_key="pipeline_name,created_at",
        precombine_field="created_at",
        **kw,
    )


def quoted(ident: str) -> str:
    """Backtick-quote each dot-separated part (bound identifiers, not
    string splicing — SURVEY.md §3 injection note)."""
    parts = ident.split(".")
    for p in parts:
        if not p or "`" in p:
            raise ValueError(f"invalid identifier part {p!r}")
    return ".".join(f"`{p}`" for p in parts)
