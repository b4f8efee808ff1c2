"""Table-lifecycle plans: the Hudi write-operation types beyond upsert
(``insert_overwrite``, ``delete_partition``, ``bulk_insert``), the
GLOBAL-index upsert (partition-path update), and the timeline lifecycle
actions (savepoint → restore, cleaner retention) — the operational
surface a reference user drives through ``hoodie.datasource.write.
operation`` and the Hudi CLI's savepoint/restore/clean commands
(pipeline_architecture.py:183-192 configures the writer these options
feed into; README.md's Hudi sections sell exactly this lifecycle).

Scale notes (100 TB):
- insert_overwrite / delete_partition never read the existing table —
  O(batch) resp. metadata-only, the point of the operations;
- the global-index lookup reads only (key, partition) columns and
  broadcasts batch keys — the table is never shuffled;
- restore/rollback/savepoint are metadata-scale timeline edits;
- the cleaner is one compaction job over the pruned pre-horizon
  commits, O(pre-horizon data), run at the cadence that bounds read
  amplification.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.tableops import (
    bulk_insert,
    delete_partitions,
    insert_overwrite,
    upsert_parquet_partitioned_global,
)
from ..operators.timeline import (
    clean_timeline,
    commit_append,
    read_realtime,
    restore_to,
    savepoint,
)
from ..sources import load_table
from .registry import query

ORDER_COLS = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"]


def _scratch(sf_dir: str, name: str) -> str:
    tag = re.sub(r"\W", "_", os.path.basename(sf_dir.rstrip("/")))
    path = f"/root/repo/.scratch/{name}_{tag}"
    shutil.rmtree(path, ignore_errors=True)  # fresh table per run
    return path


def _final_select(df: DataFrame) -> DataFrame:
    return df.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("total_price"),
        "o_orderdate",
    ).orderBy("o_orderkey", "o_orderstatus")


# --------------------------------------------------------------------------
# GLOBAL-index upsert (operators/tableops.py::upsert_parquet_partitioned
# _global — Hudi GLOBAL_SIMPLE with update.partition.path=true): orders
# lives partitioned by o_orderstatus; the batch flips keys %4 of status
# 'O' to status 'F' (+30d, ×2) — the record MOVES partitions (the 'O'
# partition loses it, 'F' gains it; the non-global writer would instead
# duplicate the key into 'F') — and inserts cloned keys into 'P'. The
# oracle windows on the key ALONE: global uniqueness means the winning
# row's status is the record's one partition.
# --------------------------------------------------------------------------


@query(
    "upsert_global_index",
    oracle="""
WITH batch AS (
  SELECT o_orderkey, 'F' AS o_orderstatus, o_totalprice * 2.0 AS o_totalprice,
         o_orderdate + INTERVAL 30 DAY AS o_orderdate, 1 AS is_batch
  FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 4 = 0
  UNION ALL
  SELECT o_orderkey + 1000000000, 'P', o_totalprice, o_orderdate, 1
  FROM orders WHERE o_orderkey % 500 = 0
),
unioned AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate, 0 AS is_batch
  FROM orders
  UNION ALL
  SELECT * FROM batch
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY o_orderkey
    ORDER BY o_orderdate DESC, is_batch DESC) AS rn
  FROM unioned
)
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total_price,
       o_orderdate
FROM ranked WHERE rn = 1
ORDER BY o_orderkey, o_orderstatus
""",
)
def upsert_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(*ORDER_COLS)
    path = _scratch(sf_dir, "global_upsert")
    upsert_parquet_partitioned_global(
        spark, orders, path, ["o_orderkey"], "o_orderdate", "o_orderstatus"
    )
    moves = (
        orders.filter(
            (F.col("o_orderstatus") == "O") & (F.col("o_orderkey") % 4 == 0)
        )
        .withColumn("o_orderstatus", F.lit("F"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2.0)
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    inserts = orders.filter(F.col("o_orderkey") % 500 == 0).select(
        (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
        F.lit("P").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
    )
    upsert_parquet_partitioned_global(
        spark,
        moves.unionByName(inserts),
        path,
        ["o_orderkey"],
        "o_orderdate",
        "o_orderstatus",
    )
    return _final_select(spark.read.parquet(path))


# --------------------------------------------------------------------------
# insert_overwrite + delete_partition (Hudi write-operation types): the
# 'O' partition is RESTATED with recomputed content (keys %3 only, +5.0
# price adjustment — no merge: the batch IS the new partition), and the
# 'F' partition is dropped by the retention op. 'P' is never read or
# written (file-level asserts in tests/test_lifecycle.py). Final state =
# untouched 'P' + restated 'O'.
# --------------------------------------------------------------------------


@query(
    "insert_overwrite_restate",
    oracle="""
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total_price,
       o_orderdate
FROM (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
  FROM orders WHERE o_orderstatus = 'P'
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice + 5.0, o_orderdate
  FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 3 = 0
)
ORDER BY o_orderkey, o_orderstatus
""",
)
def insert_overwrite_restate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(*ORDER_COLS)
    path = _scratch(sf_dir, "insert_overwrite")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    restated = orders.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_orderkey") % 3 == 0)
    ).withColumn("o_totalprice", F.col("o_totalprice") + 5.0)
    insert_overwrite(spark, restated, path, "o_orderstatus")
    delete_partitions(spark, path, "o_orderstatus", ["F"])
    return _final_select(spark.read.parquet(path))


# --------------------------------------------------------------------------
# Savepoint → restore (Hudi savepoint/restore actions): commit 1 = full
# load, commit 2 = good updates (%3: ×2, +30d), savepoint at 2, commit
# 3 = a bad batch (%2: price zeroed). restore_to(2) drops commit 3 from
# the timeline, so the realtime read equals state-as-of-2 — the oracle
# replays only load + good updates.
# --------------------------------------------------------------------------


@query(
    "timeline_restore_savepoint",
    oracle="""
WITH batch AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice * 2.0 AS o_totalprice,
         o_orderdate + INTERVAL 30 DAY AS o_orderdate, 1 AS is_batch
  FROM orders WHERE o_orderkey % 3 = 0
),
unioned AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate, 0 AS is_batch
  FROM orders
  UNION ALL
  SELECT * FROM batch
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY o_orderkey
    ORDER BY o_orderdate DESC, is_batch DESC) AS rn
  FROM unioned
)
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total_price,
       o_orderdate
FROM ranked WHERE rn = 1
ORDER BY o_orderkey, o_orderstatus
""",
)
def timeline_restore_savepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(*ORDER_COLS)
    path = _scratch(sf_dir, "restore_sp")
    commit_append(spark, orders, path, 1)
    good = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2.0)
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    commit_append(spark, good, path, 2)
    savepoint(spark, path, 2)
    bad = orders.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.lit(0.0)
    ).withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    commit_append(spark, bad, path, 3)
    restore_to(spark, path, 2)
    return _final_select(
        read_realtime(spark, path, ["o_orderkey"], "o_orderdate")
    )


# --------------------------------------------------------------------------
# Cleaner retention (Hudi hoodie.cleaner.commits.retained): four commits
# land (load; %3 +30d ×2; %5 +60d ×3; %7 +90d ×4), then the cleaner
# retains the last 2 — commits 1..3 collapse into a base at instant 3.
# Current state is UNCHANGED by cleaning (the invariant that makes a
# cleaner safe to run continuously): the oracle folds all four batches.
# --------------------------------------------------------------------------


@query(
    "timeline_cleaned_read",
    oracle="""
WITH c2 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice * 2.0 AS o_totalprice,
         o_orderdate + INTERVAL 30 DAY AS o_orderdate, 2 AS c
  FROM orders WHERE o_orderkey % 3 = 0
),
c3 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice * 3.0,
         o_orderdate + INTERVAL 60 DAY, 3
  FROM orders WHERE o_orderkey % 5 = 0
),
c4 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice * 4.0,
         o_orderdate + INTERVAL 90 DAY, 4
  FROM orders WHERE o_orderkey % 7 = 0
),
unioned AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate, 1 AS c
  FROM orders
  UNION ALL SELECT * FROM c2
  UNION ALL SELECT * FROM c3
  UNION ALL SELECT * FROM c4
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY o_orderkey
    ORDER BY o_orderdate DESC, c DESC) AS rn
  FROM unioned
)
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total_price,
       o_orderdate
FROM ranked WHERE rn = 1
ORDER BY o_orderkey, o_orderstatus
""",
)
def timeline_cleaned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(*ORDER_COLS)
    path = _scratch(sf_dir, "cleaned_read")
    commit_append(spark, orders, path, 1)
    for mod, mult, days, ts in ((3, 2.0, 30, 2), (5, 3.0, 60, 3), (7, 4.0, 90, 4)):
        batch = (
            orders.filter(F.col("o_orderkey") % mod == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") * mult)
            .withColumn(
                "o_orderdate", F.col("o_orderdate") + F.expr(f"INTERVAL {days} DAYS")
            )
        )
        commit_append(spark, batch, path, ts)
    horizon = clean_timeline(
        spark, path, ["o_orderkey"], "o_orderdate", retain_last=2
    )
    assert horizon == 3, f"cleaner horizon {horizon} != 3"
    return _final_select(
        read_realtime(spark, path, ["o_orderkey"], "o_orderdate")
    )


# --------------------------------------------------------------------------
# bulk_insert GLOBAL_SORT (Hudi's initial-load operation + default sort
# mode): the load is range-partitioned and sorted by key so parquet
# footers carry disjoint key ranges — the layout the SIMPLE file index
# prunes on (disjointness asserted file-level in tests/test_lifecycle.py).
# Content round-trip is the oracle: layout must never change data.
# --------------------------------------------------------------------------


@query(
    "bulk_insert_global_sort",
    oracle="""
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total_price,
       o_orderdate
FROM orders
ORDER BY o_orderkey, o_orderstatus
""",
)
def bulk_insert_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(*ORDER_COLS)
    path = _scratch(sf_dir, "bulk_insert")
    bulk_insert(
        spark, orders, path, sort_cols=["o_orderkey"], mode="GLOBAL_SORT"
    )
    return _final_select(spark.read.parquet(path))
