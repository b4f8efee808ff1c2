"""Pipeline lifecycle (reference R3/R4/R8): first-run full load,
second-run incremental, empty-batch short-circuit, FAILED logging with
error recovery, status report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_hudi_etl_pipeline_spark.pipeline import (
    PipelineConfig,
    get_last_run_timestamp,
    get_pipeline_status,
    run_pipeline,
)
from spark_hudi_etl_pipeline_spark.pipeline.runlog import now_ms
from spark_hudi_etl_pipeline_spark.pipeline.runner import scheduled_run

SCHEMA = "record_id long, entity_id string, created_at long, payload string"


def make_source(spark, rows):
    def source(s):
        return s.createDataFrame(rows, SCHEMA)

    return source


def make_config(spark, tmp_path, rows, **overrides):
    cfg = dict(
        name="test_pipeline",
        source=make_source(spark, rows),
        watermark_col="created_at",
        target_path=str(tmp_path / "target"),
        log_path=str(tmp_path / "log"),
        record_keys=["record_id"],
        precombine_field="load_timestamp",
        not_null_col="created_at",
    )
    cfg.update(overrides)
    return PipelineConfig(**cfg)


def test_first_run_full_load_then_incremental(spark, tmp_path):
    t0 = now_ms()
    old_rows = [(1, "u1", t0 - 1000, "a"), (2, "u2", t0 - 500, "b")]
    cfg = make_config(spark, tmp_path, old_rows)

    r1 = run_pipeline(spark, cfg)
    assert r1.status == "SUCCESS"
    assert r1.records_processed == 2
    assert r1.watermark_used is None  # first run = full load
    target = spark.read.parquet(cfg.target_path)
    assert target.count() == 2
    # metadata stamped (reference :235-236)
    assert {"processing_date", "load_timestamp"} <= set(target.columns)

    # Second run: same 2 old rows + 1 future row; only the future row
    # (created_at > previous run watermark) flows through.
    future = now_ms() + 60_000
    cfg2 = make_config(
        spark, tmp_path, old_rows + [(3, "u3", future, "c")]
    )
    r2 = run_pipeline(spark, cfg2)
    assert r2.status == "SUCCESS"
    assert r2.watermark_used is not None
    assert r2.records_processed == 1
    assert spark.read.parquet(cfg.target_path).count() == 3


def test_empty_batch_short_circuit(spark, tmp_path):
    t0 = now_ms()
    rows = [(1, "u1", t0 - 1000, "a")]
    cfg = make_config(spark, tmp_path, rows)
    run_pipeline(spark, cfg)
    # Re-run with no new rows → SUCCESS(0), no target change, watermark advances.
    r2 = run_pipeline(spark, cfg)
    assert r2.status == "SUCCESS" and r2.records_processed == 0
    assert spark.read.parquet(cfg.target_path).count() == 1
    # Watermark advanced to run 2's timestamp (reference :288 semantics).
    wm = get_last_run_timestamp(spark, cfg.log_path, cfg.name)
    assert wm is not None and wm >= r2.watermark_used


def test_failure_logs_failed_and_reraises(spark, tmp_path):
    def exploding_transform(df):
        return df.select("no_such_column")

    cfg = make_config(
        spark, tmp_path, [(1, "u1", now_ms(), "a")], transform=exploding_transform
    )
    with pytest.raises(Exception):
        run_pipeline(spark, cfg)
    log = spark.read.parquet(cfg.log_path)
    failed = log.filter(F.col("status") == "FAILED").collect()
    assert len(failed) == 1
    assert failed[0]["error_message"] is not None
    # Error ⇒ next watermark read still works and returns None (no SUCCESS yet)
    assert get_last_run_timestamp(spark, cfg.log_path, cfg.name) is None


def test_watermark_missing_log_returns_none(spark, tmp_path):
    assert get_last_run_timestamp(spark, str(tmp_path / "nope"), "x") is None


def test_status_report(spark, tmp_path):
    cfg = make_config(spark, tmp_path, [(1, "u1", now_ms() - 10, "a")])
    run_pipeline(spark, cfg)
    report = get_pipeline_status(spark, cfg.log_path, pipeline_name=cfg.name, days=1)
    rows = report.collect()
    assert len(rows) == 1
    assert rows[0]["status"] == "SUCCESS"
    assert rows[0]["records_processed"] == 1
    assert rows[0]["run_time"] is not None


def test_scheduled_run_returns_bool(spark, tmp_path):
    cfg = make_config(spark, tmp_path, [(1, "u1", now_ms(), "a")])
    assert scheduled_run(spark, cfg) is True

    def bad(df):
        raise RuntimeError("boom")

    cfg_bad = make_config(spark, tmp_path, [(2, "u2", now_ms() + 120_000, "b")], transform=bad)
    assert scheduled_run(spark, cfg_bad) is False


def test_rerun_convergence_upsert(spark, tmp_path):
    """Running the same pipeline twice over overlapping data converges
    (keyed upsert, not append): no duplicate record_ids."""
    t_future = now_ms() + 3_600_000  # rows stay "new" for both runs
    rows = [(1, "u1", t_future, "a"), (2, "u2", t_future + 1, "b")]
    cfg = make_config(spark, tmp_path, rows)
    run_pipeline(spark, cfg)
    run_pipeline(spark, cfg)  # same rows extracted again (still > watermark? no—)
    target = spark.read.parquet(cfg.target_path)
    ids = [r["record_id"] for r in target.collect()]
    assert sorted(ids) == sorted(set(ids)), "upsert must not duplicate keys"


def test_bootstrap_idempotent(spark):
    """R2: CREATE DATABASE/TABLE IF NOT EXISTS — re-running is a no-op;
    the upsert contract lands in table properties."""
    from spark_hudi_etl_pipeline_spark.pipeline import bootstrap

    try:
        bootstrap.create_pipeline_log_table(spark, "pipeline_layer.pipeline_log")
        bootstrap.create_pipeline_log_table(spark, "pipeline_layer.pipeline_log")
        cols = [f.name for f in spark.table("pipeline_layer.pipeline_log").schema.fields]
        assert cols == [
            "pipeline_name", "last_run_timestamp", "current_run_timestamp",
            "status", "records_processed", "processing_time_seconds",
            "error_message", "created_at",
        ]
        props = {
            r["key"]: r["value"]
            for r in spark.sql(
                "SHOW TBLPROPERTIES pipeline_layer.pipeline_log"
            ).collect()
        }
        assert props.get("primaryKey") == "pipeline_name,created_at"
        assert props.get("preCombineField") == "created_at"
    finally:
        spark.sql("DROP TABLE IF EXISTS pipeline_layer.pipeline_log")
        spark.sql("DROP DATABASE IF EXISTS pipeline_layer")


def test_bootstrap_rejects_bad_identifier(spark):
    from spark_hudi_etl_pipeline_spark.pipeline import bootstrap
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bootstrap.quoted("x`; DROP TABLE y")


def test_reference_api_surface(spark, tmp_path):
    """The reference's seven entry points exist with compatible shapes
    and drive a full run end-to-end (api.py — the drop-in surface)."""
    from spark_hudi_etl_pipeline_spark import api

    # R11 sample fixture: schema verbatim from the reference.
    sample = api.create_sample_data_for_testing(spark)
    assert [f.name for f in sample.schema.fields] == [
        "record_id", "entity_id", "event_timestamp", "event_type",
        "data_field_1", "data_field_2", "numeric_field_1", "numeric_field_2",
    ]
    assert sample.count() == 3

    log_path = str(tmp_path / "log")
    target = str(tmp_path / "target")
    cfg = api.PipelineConfig(
        name="api_smoke",
        source=lambda s: api.create_sample_data_for_testing(s),
        watermark_col="event_timestamp",
        target_path=target,
        log_path=log_path,
        record_keys=["record_id"],
        precombine_field="load_timestamp",
        not_null_col="event_timestamp",
    )
    # R8 with caller-owned session; R10 wrapper returns bool.
    result = api.run_pipeline(cfg, spark)
    assert result.status == "SUCCESS" and result.records_processed == 3
    assert api.daily_pipeline_run(cfg, spark) is True

    # R3 watermark now exists; R9 status report shows both runs.
    assert api.get_last_run_timestamp(spark, log_path, "api_smoke") is not None
    report = api.get_pipeline_status(spark, log_path, pipeline_name="api_smoke",
                                     show=False)
    assert report.count() >= 2
    assert spark.read.parquet(target).count() == 3  # upsert converged


def test_run_with_retries_recovers_and_logs_each_attempt(spark, tmp_path):
    """Transient failure: first two attempts explode, third succeeds —
    the wrapper returns the success result, the runlog shows 2 FAILED
    rows + 1 SUCCESS, and the table holds the batch exactly once."""
    from spark_hudi_etl_pipeline_spark.pipeline.runner import run_with_retries

    calls = {"n": 0}

    def flaky_transform(df):
        calls["n"] += 1
        if calls["n"] <= 2:
            return df.select("no_such_column")
        return df

    cfg = make_config(
        spark, tmp_path, [(1, "u1", now_ms(), "a"), (2, "u2", now_ms(), "b")],
        transform=flaky_transform,
    )
    result = run_with_retries(spark, cfg, max_attempts=3)
    assert result.status == "SUCCESS" and result.records_processed == 2
    log = spark.read.parquet(cfg.log_path)
    statuses = sorted(r["status"] for r in log.collect())
    assert statuses == ["FAILED", "FAILED", "SUCCESS"]
    assert spark.read.parquet(cfg.target_path).count() == 2


def test_run_with_retries_exhausts_and_raises(spark, tmp_path):
    from spark_hudi_etl_pipeline_spark.pipeline.runner import run_with_retries

    def always_fails(df):
        return df.select("no_such_column")

    cfg = make_config(
        spark, tmp_path, [(1, "u1", now_ms(), "a")], transform=always_fails
    )
    with pytest.raises(Exception):
        run_with_retries(spark, cfg, max_attempts=2)
    log = spark.read.parquet(cfg.log_path)
    assert log.filter(F.col("status") == "FAILED").count() == 2
    with pytest.raises(ValueError):
        run_with_retries(spark, cfg, max_attempts=0)
