"""Jar-gated Apache Hudi connector integration test.

This sandbox ships no Hudi bundle, so the test auto-skips here; on a
cluster with ``hudi-spark-bundle`` on the session classpath it runs for
real and asserts that a ``format("hudi")`` upsert round-trip — driven by
exactly the options contract :func:`hudi_writer_options` produces
(mirroring reference pipeline_architecture.py:183-192, :245-254) —
yields row-for-row parity with this engine's parquet upsert fallback
(:func:`upsert_parquet`), which SURVEY.md §7 designates as the primary
correctness path.

The options contract itself (keys, precombine field, COW table type,
keygenerator) is asserted unconditionally — that part needs no jars.
"""

from __future__ import annotations

import pytest

from spark_hudi_etl_pipeline_spark.operators.merge import (
    hudi_writer_options,
    upsert_parquet,
)


def _hudi_available(spark) -> bool:
    """True iff the Hudi DataSource is loadable in this session's JVM."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.hudi.DefaultSource", False,
            spark._jsc.sc().getClass().getClassLoader(),
        )
        return True
    except Exception:
        return False


def test_hudi_writer_options_contract():
    """The passthrough options a real connector write would receive —
    pinned so a drift in the contract is an explicit test change."""
    opts = hudi_writer_options("orders_hudi", ["o_orderkey"], "o_orderdate")
    assert opts["hoodie.table.name"] == "orders_hudi"
    assert opts["hoodie.datasource.write.recordkey.field"] == "o_orderkey"
    assert opts["hoodie.datasource.write.precombine.field"] == "o_orderdate"
    assert opts["hoodie.datasource.write.operation"] == "upsert"
    assert opts["hoodie.datasource.write.table.type"] == "COPY_ON_WRITE"
    assert opts["hoodie.datasource.write.keygenerator.class"].endswith(
        "NonpartitionedKeyGenerator"
    )
    # Composite keys join with commas (Hudi's own convention).
    multi = hudi_writer_options("t", ["a", "b"], "ts")
    assert multi["hoodie.datasource.write.recordkey.field"] == "a,b"
    # The cleaner toggle passes through.
    assert (
        hudi_writer_options("t", ["a"], "ts", automatic_clean=False)[
            "hoodie.clean.automatic"
        ]
        == "false"
    )


def test_hudi_upsert_round_trip_matches_parquet_fallback(spark, tmp_path):
    """Real-connector parity: two upsert batches written via
    ``format("hudi")`` with the passthrough options must read back
    identical to the same batches folded through the parquet fallback.
    Skips cleanly when the Hudi bundle is absent (this sandbox)."""
    if not _hudi_available(spark):
        pytest.skip("hudi-spark-bundle not on the session classpath")

    schema = "k long, v string, prec long"
    batch1 = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], schema
    )
    batch2 = spark.createDataFrame(
        [(2, "b2", 2), (4, "d", 1), (3, "stale", 0)], schema
    )
    opts = hudi_writer_options("parity_test", ["k"], "prec")

    hudi_path = str(tmp_path / "hudi_table")
    for batch, mode in ((batch1, "overwrite"), (batch2, "append")):
        (
            batch.write.format("hudi")
            .options(**opts)
            .mode(mode)
            .save(hudi_path)
        )

    pq_path = str(tmp_path / "parquet_table")
    for batch in (batch1, batch2):
        upsert_parquet(spark, batch, pq_path, ["k"], "prec")

    got = {
        (r["k"], r["v"], r["prec"])
        for r in spark.read.format("hudi")
        .load(hudi_path)
        .select("k", "v", "prec")
        .collect()
    }
    want = {
        (r["k"], r["v"], r["prec"])
        for r in spark.read.parquet(pq_path).collect()
    }
    assert got == want
    # Precombine semantics must agree: key 3's stale batch-2 row loses.
    assert (3, "c", 1) in got
