"""Deterministic hash split/sample operators (operators/sampling.py):
partition-of-the-data, determinism, fraction accuracy, append stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_hudi_etl_pipeline_spark.operators.sampling import (
    hash_bucket,
    hash_split,
    hash_stratified_sample,
    hex_threshold,
)
from spark_hudi_etl_pipeline_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_hex_threshold_boundaries():
    assert hex_threshold(0.0) == "0000"
    assert hex_threshold(0.5) == "8000"
    assert hex_threshold(0.8) == "cccc"
    assert hex_threshold(1.0) == "zzzz"
    assert hex_threshold(1.5) == "zzzz"


def test_hash_split_partitions_rows(spark):
    d = load_table(spark, SF_SMALL, "documents")
    s = hash_split(d, "doc_id", {"train": 0.8, "test": 0.2})
    # Every row gets exactly one split label; no rows dropped or duped.
    assert s.count() == d.count()
    counts = {r["split"]: r["n"] for r in s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "test"}
    total = sum(counts.values())
    # 4-hex-digit bucket => binomial around 0.8; ±6% absolute is ~5 sigma
    # at n=500.
    assert abs(counts["train"] / total - 0.8) < 0.06


def test_hash_split_three_way_and_deterministic(spark):
    d = load_table(spark, SF_SMALL, "documents")
    s1 = hash_split(d, "doc_id", {"train": 0.7, "valid": 0.1, "test": 0.2})
    s2 = hash_split(
        d.repartition(7), "doc_id", {"train": 0.7, "valid": 0.1, "test": 0.2}
    )
    a = {r["doc_id"]: r["split"] for r in s1.select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in s2.select("doc_id", "split").collect()}
    # Assignment is a pure function of the key: invariant to partitioning.
    assert a == b
    assert set(a.values()) == {"train", "valid", "test"}


def test_stratified_sample_is_subset_and_stable(spark):
    e = load_table(spark, SF_SMALL, "events")
    fr = {"click": 0.5, "purchase": 1.0, "view": 0.1}
    s = hash_stratified_sample(e, "event_id", "event_type", fr)
    rows = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    got = {r["event_type"]: r["n"] for r in rows}
    base = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # Strata not listed (default 0.0) are fully excluded.
    assert set(got) <= set(fr)
    # fraction 1.0 keeps every row.
    assert got["purchase"] == base["purchase"]
    # Sampled counts are within binomial noise of the target fraction.
    assert abs(got["click"] / base["click"] - 0.5) < 0.15
    assert got["view"] < base["view"] * 0.3
    # Membership of surviving rows is append-stable: sampling a subset of
    # the input yields exactly the subset of the sampled output.
    half = e.filter(F.col("event_id") % 2 == 0)
    s_half = hash_stratified_sample(half, "event_id", "event_type", fr)
    full_ids = {r["event_id"] for r in s.select("event_id").collect()}
    half_ids = {r["event_id"] for r in s_half.select("event_id").collect()}
    assert half_ids == {i for i in full_ids if i % 2 == 0}


def test_hash_bucket_matches_duckdb(spark):
    import duckdb

    ids = [1, 2, 42, 999, 123456789]
    df = spark.createDataFrame([(i,) for i in ids], "k long").select(
        "k", hash_bucket(F.col("k")).alias("b")
    )
    got = {r["k"]: r["b"] for r in df.collect()}
    con = duckdb.connect()
    for i in ids:
        (exp,) = con.execute(
            f"SELECT substring(md5(CAST({i} AS VARCHAR)), 1, 4)"
        ).fetchone()
        assert got[i] == exp, f"md5 bucket diverges for key {i}"


def test_fixed_per_source_exact_k_and_stable(spark):
    """Exactly 10 per source, and membership is invariant under
    repartitioning (pure function of the row)."""
    from spark_hudi_etl_pipeline_spark.plans import QUERIES
    from tests.conftest import SF_SMALL

    out = QUERIES["sample_fixed_per_source"](spark, SF_SMALL)
    rows = out.collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r["source"], set()).add(r["doc_id"])
    assert all(len(v) == 10 for v in per_source.values())
    again = {(r["source"], r["doc_id"]) for r in QUERIES["sample_fixed_per_source"](spark, SF_SMALL).collect()}
    assert again == {(r["source"], r["doc_id"]) for r in rows}


def test_weighted_pps_partitioning_invariance_and_ipw(spark):
    """PPS inclusion is a pure row function (same sample under any
    partitioning) and the fixed-point HT weight is exactly
    floor(1e6·max(1, D/w))."""
    from spark_hudi_etl_pipeline_spark.operators.sampling import (
        weighted_pps_sample,
    )

    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 700 + 1).alias("w")
    )
    a = {
        (r["k"], r["ipw_q"])
        for r in weighted_pps_sample(df, "k", "w", divisor=300).collect()
    }
    b = {
        (r["k"], r["ipw_q"])
        for r in weighted_pps_sample(
            df.repartition(13, "w"), "k", "w", divisor=300
        ).collect()
    }
    assert a == b and len(a) > 0
    for k, ipw in a:
        w = k % 700 + 1
        assert ipw == (1_000_000 if w >= 300 else 300 * 1_000_000 // w)
    # heavy rows (w >= divisor) are ALWAYS kept: p = 1
    heavy = {k for k, _ in a if k % 700 + 1 >= 300}
    expect_heavy = {k for k in range(2000) if k % 700 + 1 >= 300}
    assert heavy == expect_heavy


def test_kfold_assign_deterministic_and_balanced(spark):
    import pytest

    from spark_hudi_etl_pipeline_spark.operators.sampling import kfold_assign

    df = spark.range(1000).withColumnRenamed("id", "k")
    a = kfold_assign(df, "k", 5).collect()
    b = kfold_assign(df.repartition(7), "k", 5).collect()
    fa = {r["k"]: r["fold"] for r in a}
    fb = {r["k"]: r["fold"] for r in b}
    assert fa == fb  # partitioning-independent
    counts = [sum(1 for v in fa.values() if v == i) for i in range(5)]
    assert all(v in range(5) for v in fa.values())
    assert max(counts) < 2 * min(counts)  # statistically balanced
    with pytest.raises(ValueError):
        kfold_assign(df, "k", 1)
