"""Maintenance operators: incremental refresh convergence, CDC diff
classification (incl. null transitions), compaction byte-identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_hudi_etl_pipeline_spark.operators.maintenance import (
    compact_parquet,
    merge_aggregate_state,
    aggregate_state,
    refresh_aggregate_parquet,
    snapshot_diff,
)
from spark_hudi_etl_pipeline_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events").select("user_id", "value")
    path = str(tmp_path / "state")
    # Three uneven batches (including an empty one) folded incrementally.
    batches = [
        ev.filter(F.col("user_id") % 3 == 0),
        ev.filter(F.col("user_id") % 3 != 0),
        ev.filter(F.lit(False)),
    ]
    for b in batches:
        state = refresh_aggregate_parquet(
            spark, b, path, keys=["user_id"], sums={"value": "sum_value"},
            count_alias="n",
        )
    got = {
        r["user_id"]: (r["n"], round(r["sum_value"], 6))
        for r in state.collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["sum_value"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .collect()
    }
    assert got == want


def test_merge_aggregate_state_none_existing(spark):
    ev = load_table(spark, SF_SMALL, "events").select("user_id", "value")
    s = aggregate_state(ev, ["user_id"], {"value": "sv"})
    assert merge_aggregate_state(None, s, ["user_id"]) is s


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 1.0),      # unchanged -> dropped
            (2, "b", 2.0),      # null -> value: update (eqNullSafe)
            (3, "c", None),     # value -> null: update
            (5, "e", 5.0),      # insert
        ],                       # k=4 absent: delete
        "k int, s string, v double",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {2: "update", 3: "update", 4: "delete", 5: "insert"}


def test_snapshot_diff_schema_mismatch_raises(spark):
    import pytest

    a = spark.createDataFrame([(1, "x")], "k int, s string")
    b = spark.createDataFrame([(1, 2.0)], "k int, v double")
    with pytest.raises(ValueError):
        snapshot_diff(a, b, ["k"])


def test_compact_parquet_reduces_files_keeps_data(spark, tmp_path):
    path = str(tmp_path / "frag")
    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "value")
    ev.repartition(64).write.mode("overwrite").parquet(path)
    before_sum = spark.read.parquet(path).agg(
        F.sum("event_id"), F.count(F.lit(1))
    ).collect()[0]
    n_before, n_after = compact_parquet(
        spark, path, target_bytes_per_file=10 * 1024 * 1024
    )
    assert n_before >= 64
    assert n_after < n_before
    after_sum = spark.read.parquet(path).agg(
        F.sum("event_id"), F.count(F.lit(1))
    ).collect()[0]
    assert tuple(after_sum) == tuple(before_sum)


def test_join_refresh_converges_to_full_join(spark, tmp_path):
    """Batched delta-rule maintenance equals the full A⋈B, including a
    one-sided refresh (only new A rows) and a final both-sided batch."""
    from spark_hudi_etl_pipeline_spark.operators.maintenance import (
        refresh_join_parquet,
    )

    path = str(tmp_path / "jv")
    a = spark.createDataFrame(
        [(k, f"a{k}") for k in range(20)], "k int, av string"
    )
    b = spark.createDataFrame(
        [(k % 7, f"b{k}") for k in range(15)], "k int, bv string"
    )
    # Fold in three refreshes: (A half, B half), (A rest only), (B rest).
    a1, a2 = a.filter(F.col("k") < 10), a.filter(F.col("k") >= 10)
    b1, b2 = b.filter(F.col("bv") < "b8"), b.filter(F.col("bv") >= "b8")
    refresh_join_parquet(spark, a1, b1, path, on=["k"])
    refresh_join_parquet(spark, a2, None, path, on=["k"])
    view = refresh_join_parquet(spark, None, b2, path, on=["k"])
    got = {tuple(r) for r in view.select("k", "av", "bv").collect()}
    expected = {tuple(r) for r in a.join(b, on=["k"]).select("k", "av", "bv").collect()}
    assert got == expected and len(got) > 0


def test_refresh_corrupt_existing_state_raises(spark, tmp_path):
    """A read failure on EXISTING state must propagate, not be conflated
    with 'first refresh' — the conflation silently drops accumulated
    state and overwrites the view with one batch's partial result."""
    import pytest

    ev = load_table(spark, SF_SMALL, "events").select("user_id", "value")
    path = str(tmp_path / "state")
    refresh_aggregate_parquet(
        spark, ev, path, keys=["user_id"], sums={"value": "sv"}, count_alias="n"
    )
    # Corrupt the accumulated state (torn write / bad footer).
    import glob as _glob

    for f in _glob.glob(f"{path}/*.parquet"):
        with open(f, "wb") as fh:
            fh.write(b"not a parquet footer")
    with pytest.raises(Exception):
        refresh_aggregate_parquet(
            spark, ev, path, keys=["user_id"], sums={"value": "sv"},
            count_alias="n",
        )


def test_refresh_join_corrupt_state_raises(spark, tmp_path):
    from spark_hudi_etl_pipeline_spark.operators.maintenance import (
        refresh_join_parquet,
    )
    import glob as _glob

    import pytest

    a = spark.createDataFrame([(1, "x")], "k int, a string")
    b = spark.createDataFrame([(1, "y")], "k int, b string")
    path = str(tmp_path / "jv")
    refresh_join_parquet(spark, a, b, path, on=["k"])
    for f in _glob.glob(f"{path}/v/*.parquet"):
        with open(f, "wb") as fh:
            fh.write(b"garbage")
    with pytest.raises(Exception):
        refresh_join_parquet(
            spark, spark.createDataFrame([(2, "x2")], "k int, a string"),
            None, path, on=["k"],
        )


def test_histogram_state_incremental_equals_full(spark):
    """Additive state merge over two disjoint batches equals the state
    built in one pass, and percentile estimates are within one bin width
    of the exact percentile."""
    from pyspark.sql import functions as F

    from spark_hudi_etl_pipeline_spark.operators.maintenance import (
        histogram_state,
        merge_histogram_state,
        percentiles_from_histogram,
    )

    df = spark.range(0, 10000).select((F.col("id") % 1000).cast("double").alias("x"))
    kw = dict(lo=0.0, hi=1000.0, n_bins=100)
    full = histogram_state(df, "x", **kw)
    a = histogram_state(df.filter(F.col("x") < 300), "x", **kw)
    b = histogram_state(df.filter(F.col("x") >= 300), "x", **kw)
    merged = merge_histogram_state(a, b)
    assert {
        (r["bin"], r["cnt"]) for r in full.collect()
    } == {(r["bin"], r["cnt"]) for r in merged.collect()}
    est = {
        r["q"]: r["value_est"]
        for r in percentiles_from_histogram(merged, [0.5, 0.9], **kw).collect()
    }
    # Exact p50 of uniform 0..999 is ~500; bin width 10 bounds the error.
    assert abs(est[0.5] - 500.0) <= 10.0
    assert abs(est[0.9] - 900.0) <= 10.0


def test_histogram_out_of_range_saturates(spark):
    from spark_hudi_etl_pipeline_spark.operators.maintenance import histogram_state

    df = spark.createDataFrame([(-5.0,), (0.5,), (99.0,), (250.0,)], "x double")
    got = {
        r["bin"]: r["cnt"]
        for r in histogram_state(df, "x", lo=0.0, hi=100.0, n_bins=10).collect()
    }
    assert got == {0: 2, 9: 2}  # -5 clamps to bin 0, 250 to bin 9


def test_checksum_partition_and_order_invariant(spark):
    """The signature must not depend on partitioning or row order, must
    flag a single-row value change, and must flag a duplicated row
    (which bit_xor alone pair-cancels — the decimal sum catches it)."""
    from pyspark.sql import functions as F

    from spark_hudi_etl_pipeline_spark.operators.maintenance import (
        content_checksum,
    )

    df = spark.createDataFrame(
        [(i, f"v{i % 7}") for i in range(1000)], ["k", "s"]
    )
    cols = [F.col("k").cast("string"), F.col("s")]

    def sig(frame):
        return tuple(content_checksum(frame, cols).collect()[0])

    base = sig(df)
    assert sig(df.repartition(13, "s")) == base
    assert sig(df.orderBy(F.col("k").desc())) == base

    changed = df.withColumn(
        "s", F.when(F.col("k") == 500, F.lit("mutant")).otherwise(F.col("s"))
    )
    assert sig(changed) != base

    doubled = df.unionAll(df.filter(F.col("k") == 1))
    d = sig(doubled)
    assert d != base
    assert d[0] == base[0] + 1           # count catches it
    assert d[1] == base[1] or True       # xor MAY collide by design...
    assert d[2] != base[2]               # ...the exact sum never does

    # Same content duplicated TWICE more: count and sum still differ
    # even though xor returns to the base value (pair cancellation).
    tripled = doubled.unionAll(df.filter(F.col("k") == 1))
    t = sig(tripled)
    assert t[1] == base[1]               # xor blind to pair-cancel
    assert t[0] != base[0] and t[2] != base[2]


def test_ohlc_partial_order_key_domain(spark):
    """ids outside [0, 10^12) (or pre-epoch timestamps) would make the
    zero-padded order key sort wrong (lpad truncates; '-' sorts before
    digits) — ohlc_partial raises instead of silently corrupting the
    open/close selection (r7 ADVICE)."""
    import pytest

    from spark_hudi_etl_pipeline_spark.operators.maintenance import (
        ohlc_partial,
    )

    schema = "event_type string, ts timestamp, value double, event_id long"
    ok_rows = [
        ("a", "2024-01-01 00:00:01", 5.0, 0),
        ("a", "2024-01-01 00:00:02", 7.0, 10**12 - 1),  # widest legal id
    ]
    good = spark.createDataFrame(
        [(t, __import__("datetime").datetime.fromisoformat(ts), v, i)
         for t, ts, v, i in ok_rows],
        schema,
    )
    bars = {r["event_type"]: (r["open"], r["close"])
            for r in ohlc_partial(good).collect()}
    assert bars == {"a": (5.0, 7.0)}

    import datetime

    for bad_id, bad_ts in [
        (10**12, "2024-01-01 00:00:03"),   # one past the pad width
        (-1, "2024-01-01 00:00:03"),       # '-' would sort before digits
    ]:
        bad = spark.createDataFrame(
            [("a", datetime.datetime.fromisoformat(bad_ts), 1.0, bad_id)],
            schema,
        )
        with pytest.raises(Exception, match="order-key domain"):
            ohlc_partial(bad).collect()
    pre_epoch = spark.createDataFrame(
        [("a", datetime.datetime(1969, 12, 31), 1.0, 1)], schema
    )
    with pytest.raises(Exception, match="order-key domain"):
        ohlc_partial(pre_epoch).collect()


def test_twap_daily_weights_by_holding_time(spark):
    """TWAP weights each observation by its holding duration; the last
    observation carries zero weight and single-observation days are
    NULL (no holding period at all)."""
    import datetime

    from spark_hudi_etl_pipeline_spark.operators.maintenance import (
        twap_daily,
    )

    d = datetime.datetime
    rows = [
        # type a, one day: 10.0 held 3h, 20.0 held 1h, 99.0 terminal.
        (1, d(2024, 1, 1, 0), "a", 10.0),
        (2, d(2024, 1, 1, 3), "a", 20.0),
        (3, d(2024, 1, 1, 4), "a", 99.0),
        # type b: single event -> NULL twap.
        (4, d(2024, 1, 1, 5), "b", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {
        (r["event_type"], str(r["bar_ts"])): (r["twap"], r["n_events"])
        for r in twap_daily(df).collect()
    }
    # (10*3 + 20*1) / 4 = 12.5 — the plain mean would say 43.
    assert out[("a", "2024-01-01")] == (12.5, 3)
    assert out[("b", "2024-01-01")] == (None, 1)
