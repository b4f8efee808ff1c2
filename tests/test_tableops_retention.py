"""Retention delete: two-tier semantics, untouched-partition evidence,
idempotence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_hudi_etl_pipeline_spark.operators.tableops import retention_delete


def _mtimes(path, partition_col):
    out = {}
    for e in os.listdir(path):
        if e.startswith(f"{partition_col}="):
            d = os.path.join(path, e)
            out[e] = max(
                os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)
            )
    return out


def test_retention_two_tier_and_idempotent(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    df = spark.createDataFrame(
        [(i, f"2024-{m:02d}", m * 100 + i) for m in range(1, 7) for i in range(10)],
        "id long, month string, v long",
    )
    df.write.mode("overwrite").partitionBy("month").parquet(path)
    before = _mtimes(path, "month")

    # cutoff: drop months < 2024-03 whole; in 2024-03 keep v >= 305
    dropped, deleted = retention_delete(
        spark, path, "month", F.col("v") >= 305, "2024-03"
    )
    assert dropped == ["2024-01", "2024-02"]
    assert deleted == 5  # v = 300..304
    rows = spark.read.parquet(path).collect()
    months = {r["month"] for r in rows}
    assert months == {"2024-03", "2024-04", "2024-05", "2024-06"}
    assert {r["v"] for r in rows if r["month"] == "2024-03"} == {
        305, 306, 307, 308, 309
    }
    # newer partitions never rewritten
    after = _mtimes(path, "month")
    for m in ("month=2024-04", "month=2024-05", "month=2024-06"):
        assert after[m] == before[m], m

    # idempotent: second run drops nothing, deletes nothing
    dropped2, deleted2 = retention_delete(
        spark, path, "month", F.col("v") >= 305, "2024-03"
    )
    assert dropped2 == [] and deleted2 == 0
    assert spark.read.parquet(path).count() == len(rows)


def test_retention_boundary_fully_expired(spark, tmp_path):
    """A boundary partition whose every row fails keep_pred is removed
    entirely (no empty directory left behind)."""
    path = os.path.join(str(tmp_path), "t2")
    spark.createDataFrame(
        [(1, "2024-01", 1), (2, "2024-02", 2)], "id long, month string, v long"
    ).write.mode("overwrite").partitionBy("month").parquet(path)
    dropped, deleted = retention_delete(
        spark, path, "month", F.lit(False), "2024-02"
    )
    assert dropped == ["2024-01"] and deleted == 1
    assert not os.path.isdir(os.path.join(path, "month=2024-02"))
    # nothing partition-like remains (an empty table has no schema to
    # infer — callers detect that the same way first-write does)
    assert not [e for e in os.listdir(path) if e.startswith("month=")]
