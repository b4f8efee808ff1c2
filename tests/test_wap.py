"""Write-Audit-Publish (operators/wap.py): quality-gated atomic
commits — clean publishes, dirty aborts with the live table untouched,
crashes never expose unaudited rows."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from spark_hudi_etl_pipeline_spark.operators.merge import (
    read_indexed_table,
    table_live_files,
)
from spark_hudi_etl_pipeline_spark.operators.wap import AuditFailure, wap_upsert

SCHEMA = "k long, c long, v double, prec long"


def rows_of(df):
    return {tuple(r) for r in df.collect()}


def null_c_audit(candidate):
    return candidate.filter(F.col("c").isNull()).select("k")


@pytest.fixture()
def seeded(spark, tmp_path):
    path = str(tmp_path / "wap_table")
    base = spark.createDataFrame(
        [(1, 10, 1.0, 1), (2, 20, 2.0, 1), (3, 30, 3.0, 1)], SCHEMA
    )
    v = wap_upsert(spark, base, path, keys=["k"], precombine="prec")
    assert v == 1
    return path


def test_clean_batch_publishes_and_merges(spark, seeded):
    batch = spark.createDataFrame([(2, 21, 2.5, 2), (4, 40, 4.0, 2)], SCHEMA)
    v = wap_upsert(
        spark, batch, seeded, keys=["k"], precombine="prec", audit=null_c_audit
    )
    assert v == 2
    got = rows_of(read_indexed_table(spark, seeded))
    assert got == {
        (1, 10, 1.0, 1),
        (2, 21, 2.5, 2),
        (3, 30, 3.0, 1),
        (4, 40, 4.0, 2),
    }


def test_dirty_batch_aborts_untouched(spark, seeded):
    before_version, before_files = table_live_files(seeded)
    before_state = rows_of(read_indexed_table(spark, seeded))
    dirty = spark.createDataFrame([(5, None, 5.0, 2)], SCHEMA)
    with pytest.raises(AuditFailure) as exc:
        wap_upsert(
            spark, dirty, seeded, keys=["k"], precombine="prec",
            audit=null_c_audit,
        )
    assert [r["k"] for r in exc.value.violations] == [5]
    # Live manifest and state untouched; aborted files cleaned up.
    assert table_live_files(seeded) == (before_version, before_files)
    assert rows_of(read_indexed_table(spark, seeded)) == before_state
    on_disk = {
        os.path.basename(f)
        for f in glob.glob(os.path.join(seeded, "*.parquet"))
    }
    assert on_disk == set(before_files)


def test_crash_before_publish_invisible_to_readers(spark, seeded):
    """Staged-but-unpublished files (a crash between write and publish)
    must be invisible: manifest-consistent reads ignore orphans."""
    before_state = rows_of(read_indexed_table(spark, seeded))
    orphan_src = str(seeded) + "_orphan_src"
    spark.createDataFrame([(99, 990, 9.9, 9)], SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(orphan_src)
    src = glob.glob(os.path.join(orphan_src, "*.parquet"))[0]
    os.replace(src, os.path.join(seeded, "part-wap-deadbeef-00000.parquet"))
    assert rows_of(read_indexed_table(spark, seeded)) == before_state


def test_audit_collect_is_bounded(spark, tmp_path):
    """A per-row audit over a dirty batch collects at most
    AUDIT_SAMPLE_ROWS violation rows to the driver — the abort decision
    needs non-emptiness plus a sample, never the full violation set."""
    from spark_hudi_etl_pipeline_spark.operators.wap import (
        AUDIT_SAMPLE_ROWS,
        AuditFailure,
        wap_upsert,
    )

    path = str(tmp_path / "wap_bounded")
    n = AUDIT_SAMPLE_ROWS * 5
    dirty = spark.range(n).selectExpr(
        "id AS k", "CAST(-1 AS INT) AS v", "id AS prec"
    )
    with pytest.raises(AuditFailure) as ei:
        wap_upsert(
            spark, dirty, path, ["k"], "prec",
            audit=lambda c: c.filter("v < 0"),
        )
    assert 0 < len(ei.value.violations) <= AUDIT_SAMPLE_ROWS
    # Abort left no published manifest and no live rows.
    import os
    assert not os.path.isdir(os.path.join(path, "_manifest"))
