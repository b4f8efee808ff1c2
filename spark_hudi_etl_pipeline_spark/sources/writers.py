"""Table layout writers: bucketing and partitioning for shuffle-free
joins and partition-pruned scans.

The reference writes non-partitioned Hudi COW tables and leans on the
connector's key index (SURVEY.md §1.4, §2.1 S3/S6). At 100 TB the
equivalent pure-Spark leverage is physical layout:

- **Bucketed tables** (hash-clustered by join/merge key): two tables
  bucketed by the same key with the same bucket count join WITHOUT a
  shuffle on either side — the planner trusts the bucket spec as the
  output partitioning. This is how the fact-fact ``orders ⋈ lineitem``
  join and the upsert merge (operators/merge.py) drop their exchange at
  scale.
- **Partitioned layout** (directory-per-value): equality/range filters
  on the partition column prune entire directories at planning time
  (``PartitionFilters`` in the scan node) — the batch twin of the
  reference's incremental predicate (`:221-224`), made physical.

Bucketing requires the table catalog (``saveAsTable``); plain
``.parquet(path)`` cannot record a bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-clustered)
    catalog table. Joins/aggregations keyed on ``bucket_cols`` between
    tables sharing (cols, n_buckets) plan with zero exchanges; sorting
    within buckets additionally removes the sort of a sort-merge join.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, *, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet: one directory per distinct value
    combination. Filters on ``partition_cols`` become PartitionFilters
    (pruned before any file is opened). Keep partition cardinality
    bounded (≲ 10⁴ directories) — high-cardinality keys belong in
    bucketing, not partitioning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Scan a partitioned layout (partition columns are reconstructed
    from directory names)."""
    return spark.read.parquet(path)
