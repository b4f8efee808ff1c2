"""Deterministic split/sample plans (operators/sampling.py) — the
train/valid/test plumbing of a training-data pipeline, made a pure
function of each row so the same corpus splits identically on any
cluster, any partitioning, any engine (the DuckDB oracles recompute the
very same md5 buckets — full value-hash parity, not rows-only).

Scale notes (100 TB): both ops are narrow, codegen'd filter/project
expressions over the hash of an existing column — no shuffle, no state,
no sampling coordination; they compose under any scan and preserve
pushdown of other predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import hash_split, hash_stratified_sample
from ..sources import load_table
from .registry import query

# --------------------------------------------------------------------------
# 80/20 train/test split of the documents corpus by md5(doc_id) bucket.
# 0.8 * 16^4 = 52428 = 0xcccc — the oracle states the threshold inline.
# --------------------------------------------------------------------------


@query(
    "train_test_split_hash",
    oracle="""
SELECT split, count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM (
  SELECT doc_id,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
              THEN 'train' ELSE 'test' END AS split
  FROM documents)
GROUP BY split
ORDER BY split
""",
)
def train_test_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    split = hash_split(d, "doc_id", {"train": 0.8, "test": 0.2})
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# Deterministic stratified sample of events: 50% of clicks, 100% of
# purchases, 10% of views, 0% of everything else — the reproducible form
# of sampleBy. Verified per-stratum: count and a value checksum.
# --------------------------------------------------------------------------


@query(
    "stratified_sample_events",
    oracle="""
SELECT event_type, count(*) AS n_sampled, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 4) <
      CASE event_type
        WHEN 'click' THEN '8000'
        WHEN 'purchase' THEN 'zzzz'
        WHEN 'view' THEN '1999'
        ELSE '0000' END
GROUP BY event_type
ORDER BY event_type
""",
)
def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    sampled = hash_stratified_sample(
        e,
        "event_id",
        "event_type",
        {"click": 0.5, "purchase": 1.0, "view": 0.1},
    )
    return (
        sampled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("sum_value_cents"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Exact-k per-group sampling: exactly 10 documents per source, chosen by
# md5 priority — the deterministic replacement for reservoir sampling
# when the sample must be reproducible across engines/runs/partitionings
# (hash-fraction sampling gives a BINOMIAL count; training-data recipes
# often need exact shard sizes). One window shuffle on the group key;
# the per-group heap state is k rows, independent of group size.
# --------------------------------------------------------------------------


@query(
    "sample_fixed_per_source",
    oracle="""
SELECT source, doc_id, rnk FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rnk
  FROM documents)
WHERE rnk <= 10
ORDER BY source, rnk
""",
)
def sample_fixed_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        d.select("source", "doc_id")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .orderBy("source", "rnk")
    )


# --------------------------------------------------------------------------
# Weighted (probability-proportional-to-size) sampling: documents drawn
# with p = min(1, length/1500) — the mixture-sampling primitive that
# makes a sample's TOKEN budget track the corpus (long docs near-surely
# kept, short ones thinned), with exact-integer Horvitz-Thompson
# weights attached. The inclusion rule and the ipw are pure integer
# arithmetic, so the oracle replays them bit-for-bit.
# --------------------------------------------------------------------------


@query(
    "weighted_sample_pps",
    oracle="""
SELECT doc_id, w, ipw_q FROM (
  SELECT doc_id, length(text) AS w,
         CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS INT) AS BIGINT) AS u16,
         CASE WHEN length(text) >= 1500 THEN 1000000
              ELSE (1500 * 1000000) // length(text) END AS ipw_q
  FROM documents
  WHERE length(text) > 0
)
WHERE u16 * 1500 < w * 65536
ORDER BY doc_id
""",
)
def weighted_sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_pps_sample

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.length("text").alias("w"))
        .filter(F.col("w") > 0)
    )
    return (
        weighted_pps_sample(d, "doc_id", "w", divisor=1500)
        .select("doc_id", "w", "ipw_q")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# k-fold cross-validation assignment (operators/sampling.py::
# kfold_assign): fold = portable md5-60bit hash of the doc key, mod k —
# map-only, engine-portable, leakage-safe up to key identity. The query
# reports the per-fold census (count + per-source spread + key range) a
# training pipeline checks before trusting the folds.
# --------------------------------------------------------------------------


@query(
    "kfold_split_documents",
    oracle="""
WITH folded AS (
  SELECT doc_id, source,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
           % 5 AS fold
  FROM documents
)
SELECT fold,
       count(*) AS n_docs,
       CAST(count(DISTINCT source) AS INTEGER) AS n_sources,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM folded GROUP BY fold ORDER BY fold
""",
)
def kfold_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import kfold_assign

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    folded = kfold_assign(docs, "doc_id", 5)
    return (
        folded.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").cast("int").alias("n_sources"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("fold")
    )


# --------------------------------------------------------------------------
# Deterministic epoch shuffle (operators/sampling.py::epoch_shuffle):
# the "reshuffle the corpus every epoch" training primitive as a pure
# function of (doc_id, epoch) — 32-bit salted md5 orders the docs,
# mod-8 buckets them into shards, rank-within-shard is the read
# position. The oracle replays the identical hash/mod/rank chain, so
# every assignment row is value-checked. Scale shape: map-side hash +
# ONE exchange on shard; each shard sorts independently (raise the
# shard count until a shard fits an executor — the shard files are what
# the trainer consumes), no global sort anywhere.
# --------------------------------------------------------------------------


@query(
    "epoch_shuffle_shards",
    oracle="""
WITH h AS (
  SELECT doc_id, source,
         CAST('0x' || substring(md5('epoch:1:' || CAST(doc_id AS VARCHAR)),
                                1, 8) AS BIGINT) AS u32
  FROM documents
)
SELECT doc_id, source, u32 % 8 AS shard,
       row_number() OVER (PARTITION BY u32 % 8 ORDER BY u32, doc_id) AS pos
FROM h
ORDER BY doc_id
""",
)
def epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return epoch_shuffle(docs, "doc_id", epoch=1, shards=8).orderBy("doc_id")


# --------------------------------------------------------------------------
# Embargoed temporal split (the purged time split of de Prado's purged
# k-fold, in its simplest two-way form): when the label horizon spans
# time, events inside an embargo gap before the test boundary leak
# future information into training — so the split is THREE-way: train
# strictly before (boundary − embargo), an excluded embargo band, test
# from the boundary on. The boundary is the last event day minus 2
# days, derived in-query (one tiny agg broadcast back); embargo = 1
# day. Census per split proves the bands are disjoint and exhaustive.
# Map-only assignment at any scale — no shuffle beyond the final
# |splits|-row census.
# --------------------------------------------------------------------------


@query(
    "embargo_time_split",
    oracle="""
WITH b AS (
  SELECT CAST(max(ts) AS DATE) - 2 AS test_start FROM events
),
tagged AS (
  SELECT CASE
           WHEN CAST(e.ts AS DATE) >= b.test_start THEN 'test'
           WHEN CAST(e.ts AS DATE) >= b.test_start - 1 THEN 'embargo'
           ELSE 'train'
         END AS split,
         e.user_id, CAST(e.ts AS DATE) AS d
  FROM events e CROSS JOIN b
)
SELECT split,
       count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(min(d) AS VARCHAR) AS min_day,
       CAST(max(d) AS VARCHAR) AS max_day
FROM tagged GROUP BY split ORDER BY split
""",
)
def embargo_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bound = ev.agg(
        F.date_sub(F.max(F.col("ts").cast("date")), 2).alias("test_start")
    )
    tagged = ev.crossJoin(F.broadcast(bound)).select(
        F.when(
            F.col("ts").cast("date") >= F.col("test_start"), "test"
        )
        .when(
            F.col("ts").cast("date") >= F.date_sub(F.col("test_start"), 1),
            "embargo",
        )
        .otherwise("train")
        .alias("split"),
        "user_id",
        F.col("ts").cast("date").alias("d"),
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("d").cast("string").alias("min_day"),
            F.max("d").cast("string").alias("max_day"),
        )
        .orderBy("split")
    )
