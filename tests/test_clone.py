"""Shallow (zero-copy) table clone: Delta-style SHALLOW CLONE of a
commit timeline (operators/timeline.py::shallow_clone) — marker-only
creation, independent divergence in both directions, materialization via
compaction, and the guarded failure modes (partial compaction, source
compacted past the clone point, restore/rollback across the clone
point). The reference's Hudi tables lack native cloning; this is the
lakehouse branch/experiment-snapshot primitive a 100 TB user reaches
for (Delta SHALLOW CLONE semantics)."""

from __future__ import annotations

import os
import shutil

import pytest

from spark_hudi_etl_pipeline_spark.operators.timeline import (
    COMMIT_COL,
    commit_append,
    commit_instants,
    compact_timeline,
    read_as_of,
    read_realtime,
    restore_to,
    rollback_last,
    shallow_clone,
    savepoints,
)

SCHEMA = "k long, v string, prec long"


def rows_of(df):
    return {tuple(r) for r in df.collect()}


def state(spark, path):
    return rows_of(read_realtime(spark, path, ["k"], "prec"))


@pytest.fixture()
def src(spark, tmp_path):
    path = str(tmp_path / "src")
    c1 = spark.createDataFrame([(1, "a1", 10), (2, "b1", 10)], SCHEMA)
    c2 = spark.createDataFrame([(2, "b2", 20), (3, "c1", 20)], SCHEMA)
    for ts, batch in ((1, c1), (2, c2)):
        commit_append(spark, batch, path, ts)
    return path


def test_clone_is_zero_copy_and_reads_as_of(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    assert shallow_clone(spark, src, dst, as_of=1) == 1
    # zero-copy: the marker is the ONLY thing on disk
    assert os.listdir(dst) == ["_clone.json"]
    assert state(spark, dst) == {(1, "a1", 10), (2, "b1", 10)}
    # default as_of = latest
    dst2 = str(tmp_path / "dst2")
    assert shallow_clone(spark, src, dst2) == 2
    assert state(spark, dst2) == state(spark, src)


def test_divergence_is_isolated_both_ways(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst)  # as_of=2
    before_src = state(spark, src)
    # clone-side commit: invisible to the source
    commit_append(
        spark, spark.createDataFrame([(1, "CLONE", 99)], SCHEMA), dst, 3
    )
    assert state(spark, src) == before_src
    assert state(spark, dst) == {(1, "CLONE", 99), (2, "b2", 20), (3, "c1", 20)}
    # source-side commit after the clone point: invisible to the clone
    commit_append(
        spark, spark.createDataFrame([(4, "SRC", 40)], SCHEMA), src, 4
    )
    assert (4, "SRC", 40) in state(spark, src)
    assert (4, "SRC", 40) not in state(spark, dst)


def test_clone_commit_monotonicity_spans_source_instants(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst)  # clone point 2
    assert commit_instants(spark, dst) == [1, 2]
    batch = spark.createDataFrame([(9, "x", 1)], SCHEMA)
    with pytest.raises(ValueError, match="monotone"):
        commit_append(spark, batch, dst, 2)


def test_compaction_materializes_clone(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst)
    commit_append(
        spark, spark.createDataFrame([(1, "CLONE", 99)], SCHEMA), dst, 3
    )
    expect = state(spark, dst)
    compact_timeline(spark, dst, ["k"], "prec", 3)
    assert not os.path.isfile(os.path.join(dst, "_clone.json"))
    assert state(spark, dst) == expect
    # fully self-contained now: the source can vanish
    shutil.rmtree(src)
    assert state(spark, dst) == expect


def test_partial_compaction_of_clone_raises(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst)  # clone point 2
    with pytest.raises(ValueError, match="partially compact"):
        compact_timeline(spark, dst, ["k"], "prec", 1)


def test_source_compaction_past_clone_point_is_detected(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst, as_of=1)
    compact_timeline(spark, src, ["k"], "prec", 2)
    with pytest.raises(ValueError, match="broken"):
        state(spark, dst)


def test_pin_source_savepoints_the_clone_point(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst, as_of=1, pin_source=True)
    assert savepoints(src) == [1]
    # the pin clamps source compaction AT the clone point — reads survive
    compact_timeline(spark, src, ["k"], "prec", 2)
    assert state(spark, dst) == {(1, "a1", 10), (2, "b1", 10)}


def test_restore_and_rollback_guards(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst)  # clone point 2
    with pytest.raises(ValueError, match="no local|belongs to the referenced"):
        rollback_last(spark, dst)
    with pytest.raises(ValueError, match="clone point"):
        restore_to(spark, dst, 1)
    commit_append(
        spark, spark.createDataFrame([(1, "CLONE", 99)], SCHEMA), dst, 3
    )
    assert rollback_last(spark, dst) == 3
    assert state(spark, dst) == state(spark, src)
    # restore AT the clone point drops only local deltas — legal
    commit_append(
        spark, spark.createDataFrame([(1, "C2", 98)], SCHEMA), dst, 4
    )
    assert restore_to(spark, dst, 2) == [4]
    assert state(spark, dst) == state(spark, src)


def test_clone_of_clone_chains(spark, src, tmp_path):
    mid = str(tmp_path / "mid")
    leaf = str(tmp_path / "leaf")
    shallow_clone(spark, src, mid)  # point 2
    commit_append(
        spark, spark.createDataFrame([(5, "m", 30)], SCHEMA), mid, 3
    )
    shallow_clone(spark, mid, leaf)  # point 3
    commit_append(
        spark, spark.createDataFrame([(6, "l", 40)], SCHEMA), leaf, 4
    )
    assert state(spark, leaf) == state(spark, mid) | {(6, "l", 40)}
    # time travel through the chain hits the source's commit 1
    assert rows_of(read_as_of(spark, leaf, ["k"], "prec", 1)) == {
        (1, "a1", 10),
        (2, "b1", 10),
    }


def test_clone_destination_must_be_empty(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst)
    with pytest.raises(ValueError, match="not empty"):
        shallow_clone(spark, src, dst)
    with pytest.raises(ValueError, match="not a commit"):
        shallow_clone(spark, src, str(tmp_path / "d2"), as_of=7)


def test_clone_instant_predicates_stay_partition_filters(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst, as_of=1)
    commit_append(
        spark, spark.createDataFrame([(7, "z", 50)], SCHEMA), dst, 5
    )
    df = read_realtime(spark, dst, ["k"], "prec")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the clone-point predicate must reach the SOURCE scan as a
    # partition filter, not a post-scan filter
    src_scan = next(
        ln for ln in plan.splitlines() if "FileScan" in ln and "/src" in ln
    )
    pf = src_scan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert COMMIT_COL in pf and "<=" in pf, src_scan
