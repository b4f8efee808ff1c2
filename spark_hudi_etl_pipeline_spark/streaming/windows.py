"""Structured Streaming operators over the events shape.

The reference's "streaming" is a batch-incremental watermark loop
(SURVEY.md §1.1); this module is the streaming-native tier the README
aspires to ("Event Streams", README.md:19; "Optimized for both batch and
streaming", :554): real ``withWatermark`` + windowed aggregations +
within-watermark dedup + a foreachBatch upsert sink that reuses the
batch merge operator — the watermark loop made native.

All operators are transformations on an unbounded DataFrame; they work
identically on any streaming source (file/kafka/rate). Watermarks bound
state: at 100 TB/day the state store holds only open windows within the
lateness horizon, and ``dropDuplicatesWithinWatermark`` evicts seen-key
state at the horizon instead of growing forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: events fixture schema with ts as proper TimestampType (streams must
#: declare their schema up front — no inference on unbounded input).
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def events_file_stream(
    spark: SparkSession, dir_path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of events parquet files —
    each arriving file is a micro-batch (the test/dev stand-in for a
    Kafka topic; swap ``readStream.format``)."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(dir_path)


def tumbling_window_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-event-type counts/sums in tumbling event-time windows;
    late rows beyond ``watermark`` are dropped and their windows closed
    (bounded state)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Overlapping (sliding) windows — each event contributes to
    window/slide windows; watermark bounds the open set."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
        )
    )


def session_window_stats(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user session windows (dynamic length, closed after ``gap`` of
    inactivity) — the streaming twin of plans.extract.events_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    *,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon
    (``dropDuplicatesWithinWatermark``): the streaming form of the
    precombine/upsert dedup — state for a key is dropped once the
    watermark passes it, so state is bounded by horizon × arrival rate."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on,
    *,
    left_time: str,
    right_time: str,
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    upper: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval bound:
    ``on`` (equality) AND ``left_time <= right_time <= left_time + upper``.

    Both sides carry watermarks, and the time-range conjunct is what lets
    the state store evict: a buffered left row can only ever match right
    rows within ``upper`` of it, so once the right watermark passes
    ``left_time + upper`` the row is dropped. Without the bound a
    stream-stream join buffers both sides forever — at 100 TB/day that is
    the difference between O(horizon × rate) and unbounded state.

    Works identically on batch DataFrames (watermarks are no-ops there),
    which is how the DuckDB oracle checks it.

    ``how="left_outer"`` emits unmatched left rows (null right columns)
    once the right watermark passes ``left_time + upper`` — the state
    eviction point doubles as the proof-of-no-match point, so outer
    results are exact, just deferred by the lateness horizon. (Inner
    emits matches immediately; only the null rows wait on eviction.)

    ``how="left_anti"`` (NOT supported natively for stream-stream by
    Spark) is DERIVED here as the outer join filtered to the null rows,
    projected back to the left schema — "which clicks did NOT convert
    within the hour", the abandonment-detection shape. Emission timing
    and state cost are exactly the outer join's: a left row is proven
    matchless (and emitted) only when the right watermark passes its
    bound. On batch inputs the derivation equals a native anti join,
    which is how the oracle checks it.
    """
    l = left.withWatermark(left_time, left_watermark)
    r = right.withWatermark(right_time, right_watermark)
    bound = (F.col(right_time) >= F.col(left_time)) & (
        F.col(right_time) <= F.col(left_time) + F.expr(f"INTERVAL {upper}")
    )
    if how == "left_anti":
        outer = l.join(r, on & bound, "left_outer")
        return outer.filter(F.col(right_time).isNull()).select(
            *[F.col(c) for c in left.columns]
        )
    return l.join(r, on & bound, how)


def chained_window_rollup(
    events: DataFrame,
    *,
    fine: str = "1 hour",
    coarse: str = "4 hours",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Two chained stateful aggregations in ONE streaming query
    (Spark 3.4+ multiple-stateful-operator support): per-type counts in
    fine tumbling windows, then a coarse rollup over the finalized fine
    windows via ``window_time`` — the streaming form of an hourly→daily
    rollup cube. Each stage's state is bounded by its own watermark
    horizon; the fine aggregate also shrinks what the coarse stage
    shuffles by |types|×(coarse/fine) versus re-aggregating raw events.

    ``value`` is summed as DECIMAL(18,2) (the fixture values are exactly
    2-decimal) so partial-aggregation order can never move the result —
    output is integer cents.
    """
    fine_agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", fine).alias("w1"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )
    )
    return (
        fine_agg.groupBy(F.window(F.window_time("w1"), coarse).alias("w2"))
        .agg(
            F.count(F.lit(1)).alias("n_type_hours"),
            F.sum("n_events").alias("n_events"),
            (F.sum("sv") * 100).cast("long").alias("sum_value_cents"),
        )
        .select(
            F.col("w2.start").alias("w_start"),
            "n_type_hours",
            "n_events",
            "sum_value_cents",
        )
    )


def foreach_batch_upsert(
    target_path: str, keys: list[str], precombine: str,
    *, evolve_schema: bool = False,
):
    """foreachBatch sink: apply the engine's keyed upsert merge to each
    micro-batch — streaming upsert is the reference's watermark loop made
    native (SURVEY.md §7 Phase 3); reuses operators/merge.py so batch and
    streaming share one merge semantic (including, with
    ``evolve_schema=True``, Hudi-style schema-on-read widening when a
    later stream adds columns)."""
    from ..operators.merge import upsert_parquet

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_parquet(
            batch_df.sparkSession, batch_df, target_path,
            keys=keys, precombine=precombine, evolve_schema=evolve_schema,
        )

    return apply


def foreach_batch_timeline_commit(target_path: str, *, base_instant: int = 0):
    """foreachBatch sink that appends each micro-batch as an immutable
    commit on the MOR timeline (operators/timeline.py) — streaming
    lakehouse ingest: O(batch) appends, no read-modify-write per batch,
    with time travel / incremental pull / compaction available on the
    result (Hudi's deltastreamer → deltacommit path).

    Commit instant = ``base_instant + batch_id + 1`` — monotone because
    Structured Streaming assigns batch ids monotonically. Exactly-once
    under retries: a REPLAYED batch (failure after the commit landed but
    before the streaming checkpoint advanced) finds its instant already
    on the timeline and skips — the same instant-exists check Hudi's
    streaming writer does.
    """
    from ..operators.timeline import commit_append, commit_instants

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        instant = base_instant + batch_id + 1
        if instant in commit_instants(batch_df.sparkSession, target_path):
            return  # replayed batch: its commit already landed
        commit_append(batch_df.sparkSession, batch_df, target_path, instant)

    return apply


def foreach_batch_dedup_store(
    store_table: str,
    verdict_path: str | None = None,
    *,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    run_tag: str = "run",
):
    """foreachBatch sink: incremental dedup of each micro-batch against
    the persisted fingerprint store (operators/dedup.py::
    fingerprint_store_ingest) — the reference's watermark loop
    (pipeline_architecture.py:221-224) applied to dedup, as a STREAMING
    stage: only the arriving batch is fingerprinted and probed; the
    corpus-sized store is bucket-joined, never rescanned or reshuffled.

    The store batch id is ``f"{run_tag}-{batch_id}"`` — Structured
    Streaming replays a micro-batch under the SAME batch_id after a
    failure before the checkpoint advanced, so a replayed batch lands on
    the ingest's idempotent-replay contract: first occurrences keep
    ``is_dup=0`` and the store does not grow twice.

    ``verdict_path``: optional parquet directory appended with each
    batch's per-row verdicts ``(id, fp, canonical_id, is_dup)``; when
    None the sink only maintains the store (the ingest's probe snapshot
    and store append are eager, so no extra action is needed).
    """
    from ..operators.dedup import fingerprint_store_ingest

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        verdicts = fingerprint_store_ingest(
            batch_df,
            store_table,
            id_col=id_col,
            fp_col=fp_col,
            batch_id=f"{run_tag}-{batch_id}",
        )
        if verdict_path is not None:
            verdicts.write.mode("append").parquet(verdict_path)

    return apply


def foreach_batch_ohlc_append(state_path: str, *, run_tag: str = "run"):
    """foreachBatch sink maintaining OHLC bar state incrementally (the
    deltastreamer-into-continuous-aggregate shape): each micro-batch
    APPENDS its per-(type, day) partial bars tagged with
    ``run_tag:batch_id``; readers fold the partials with
    :func:`operators.maintenance.merge_ohlc`, so the state stays
    mergeable and O(types × days × batches-touching-the-day) — never
    re-reading raw events.

    Exactly-once under checkpoint recovery: a replayed micro-batch id
    finds its own ``src`` tag already committed and skips — the same
    replay-idempotence contract as foreach_batch_dedup_store (sums
    would double-count otherwise; min/max alone wouldn't care)."""
    from ..operators.maintenance import ohlc_partial, read_state_if_exists

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        src = f"{run_tag}:{batch_id}"
        existing = read_state_if_exists(spark, state_path)
        if (
            existing is not None
            and existing.filter(F.col("src") == src).limit(1).count() > 0
        ):
            return
        partial = ohlc_partial(batch_df).withColumn("src", F.lit(src))
        partial.write.mode("append").parquet(state_path)

    return apply


def foreach_batch_minhash_store(
    store_table: str,
    verdict_path: str | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    run_tag: str = "run",
):
    """foreachBatch sink: incremental NEAR-dup detection of each
    micro-batch against the persisted MinHash band store
    (operators/dedup.py::minhash_store_ingest) — the fuzzy tier of the
    streaming dedup stage next to :func:`foreach_batch_dedup_store`'s
    exact tier. Only the arriving micro-batch is signed and banded; the
    corpus-sized store is bucket-joined, never rescanned.

    Store batch ids follow ``f"{run_tag}-{batch_id}"``, so a micro-batch
    replayed after a pre-checkpoint failure lands on the ingest's
    idempotent-replay contract (same verdicts, no store growth).

    ``verdict_path``: optional parquet directory appended with each
    batch's per-row verdicts (id, is_neardup, match_id, est_jaccard).
    """
    from ..operators.dedup import minhash_store_ingest

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        verdicts = minhash_store_ingest(
            batch_df,
            store_table,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            batch_id=f"{run_tag}-{batch_id}",
        )
        if verdict_path is not None:
            verdicts.write.mode("append").parquet(verdict_path)

    return apply
