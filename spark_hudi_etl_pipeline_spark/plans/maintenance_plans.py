"""Maintenance-tier plans (operators/maintenance.py): incremental
aggregate refresh and snapshot CDC diff, both DuckDB-oracled.

The refresh query is the reference's whole program in miniature —
watermark-split batches folded into a keyed materialized state — checked
against the one thing incremental maintenance must equal: the full
recompute over all history.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.maintenance import refresh_aggregate_parquet, snapshot_diff
from ..sources import load_table
from .registry import query

# --------------------------------------------------------------------------
# Incremental aggregate refresh: two watermark-split batches (the
# reference's incremental predicate F3, :223) merged into a per-user
# summary; the oracle is the full-history GROUP BY the incremental path
# must converge to. avg is derived from mergeable (sum, count) state.
# --------------------------------------------------------------------------


@query(
    "incremental_agg_refresh",
    oracle="""
SELECT user_id, count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(sum(value) / count(*), 4) AS avg_value
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    tag = re.sub(r"\W", "_", os.path.basename(sf_dir.rstrip("/")))
    path = f"/root/repo/.scratch/agg_state_{tag}"
    shutil.rmtree(path, ignore_errors=True)  # fresh state per run
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    for batch in (ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut)):
        state = refresh_aggregate_parquet(
            spark,
            batch,
            path,
            keys=["user_id"],
            sums={"value": "sum_value"},
            count_alias="n_events",
        )
    return state.select(
        "user_id",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        F.round(F.col("sum_value") / F.col("n_events"), 4).alias("avg_value"),
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# Snapshot CDC diff: a second orders snapshot is derived in-query
# (deterministic key arithmetic — deletes at %97, price updates at %13,
# inserts cloned past the key space at %211) and classified against the
# original with one full-outer join. The oracle rebuilds the same
# snapshot and classification in SQL.
# --------------------------------------------------------------------------


@query(
    "snapshot_diff_cdc",
    oracle="""
WITH new_snap AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + CASE WHEN o_orderkey % 13 = 0 THEN 100 ELSE 0 END
           AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 211 = 0),
diff AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
         CASE WHEN o.o_orderkey IS NULL THEN 'insert'
              WHEN n.o_orderkey IS NULL THEN 'delete'
              WHEN o.o_totalprice <> n.o_totalprice THEN 'update' END
           AS change_type
  FROM orders o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey)
SELECT change_type, count(*) AS n_keys, sum(k) AS sum_keys
FROM diff
WHERE change_type IS NOT NULL
GROUP BY change_type
ORDER BY change_type
""",
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    old = load_table(spark, sf_dir, "orders")
    bumped = old.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.col("o_totalprice")
        + F.when(F.col("o_orderkey") % 13 == 0, 100).otherwise(0),
    )
    inserts = old.filter(F.col("o_orderkey") % 211 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 1000000000
    )
    new = bumped.unionByName(inserts)
    return (
        snapshot_diff(old, new, ["o_orderkey"])
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("o_orderkey").alias("sum_keys"),
        )
        .orderBy("change_type")
    )
