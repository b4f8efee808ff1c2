"""Incremental-extract query family (reference R5/R9, SURVEY.md §2.2).

The reference's extract (pipeline_architecture.py:201-231) is: projection
with aliasing (P1/P4), null filter (F1), optional watermark range
predicate appended only on incremental runs (F3/F5), multi-column
ordering (O2). Its monitoring query (:337-369) is projection + equality
+ range filters + sort desc (F2/F3/O3). Both are re-expressed here as
bound-parameter DataFrame plans over the ``events`` fixture (the
FIXTURES.md A↔B mapping) — no SQL-string splicing (the reference
interpolates f-strings, an injection hazard; SURVEY.md §3).

The nondeterministic companion columns the real pipeline adds (uuid
surrogate key, current_timestamp load stamp — P2/P5) are exercised in
:mod:`..pipeline` and its tests; oracle-checked plans expose only
deterministic columns (SURVEY.md §5 caveat).

Scale: the watermark predicate is exactly the filter Catalyst pushes into
the parquet/Hudi scan (PushedFilters + row-group min/max skipping), so an
incremental run over a 100 TB table reads only the recent files — verify
with ``.explain`` in tests/test_explain_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

#: Fixed watermark inside the events fixture's 2024-01 range, standing in
#: for "last successful run" in deterministic oracle checks.
WATERMARK_TS = "2024-01-15 00:00:00"
LOOKBACK_TS = "2024-01-24 00:00:00"


def extract_events(
    spark: SparkSession,
    sf_dir: str,
    watermark: str | None = None,
) -> DataFrame:
    """The reference extract shape, parameterized full-vs-incremental
    (F5): watermark ``None`` ⇒ full load; else ``ts > watermark``."""
    e = load_table(spark, sf_dir, "events")
    out = e.filter(F.col("ts").isNotNull())  # F1
    if watermark is not None:  # F3/F5 — the incremental-CDC predicate
        out = out.filter(F.col("ts") > F.lit(watermark).cast("timestamp"))
    return out.select(  # P1/P4
        F.col("event_id").alias("record_id"),
        F.col("user_id").alias("entity_id"),
        F.col("ts").alias("event_timestamp"),
        "event_type",
        F.col("value").alias("numeric_field_1"),
        "props",
    ).orderBy("entity_id", "event_timestamp")  # O2


_EXTRACT_SELECT = """
SELECT event_id AS record_id,
       user_id  AS entity_id,
       ts       AS event_timestamp,
       event_type,
       value    AS numeric_field_1,
       props
FROM events
WHERE ts IS NOT NULL
"""


@query(
    "extract_full_load",
    oracle=_EXTRACT_SELECT + "ORDER BY entity_id, event_timestamp",
)
def extract_full_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_events(spark, sf_dir, watermark=None)


@query(
    "extract_incremental",
    oracle=_EXTRACT_SELECT
    + f"  AND ts > TIMESTAMP '{WATERMARK_TS}'\nORDER BY entity_id, event_timestamp",
)
def extract_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_events(spark, sf_dir, watermark=WATERMARK_TS)


@query(
    "watermark_lookup",
    oracle="""
SELECT event_id, ts, user_id
FROM events
WHERE event_type = 'signup'
ORDER BY ts DESC, event_id DESC
LIMIT 1
""",
)
def watermark_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O1 (pipeline_architecture.py:136-137): equality filter →
    ORDER BY ts DESC LIMIT 1 → TakeOrderedAndProject (top-1 without a
    global sort; each partition contributes one candidate)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "signup")
        .select("event_id", "ts", "user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1)
    )


@query(
    "status_report_window",
    oracle=f"""
SELECT event_id, user_id, event_type, round(value, 2) AS value, ts
FROM events
WHERE event_type IN ('purchase', 'error')
  AND ts >= TIMESTAMP '{LOOKBACK_TS}'
ORDER BY ts DESC
""",
)
def status_report_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference R9 shape (:347-361): equality + lookback-range filters,
    sort desc — the monitoring query run against the audit log, here over
    the events fixture with a fixed cutoff for determinism."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(
            F.col("event_type").isin("purchase", "error")
            & (F.col("ts") >= F.lit(LOOKBACK_TS).cast("timestamp"))
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round("value", 2).alias("value"),
            "ts",
        )
        .orderBy(F.desc("ts"))
    )


@query(
    "events_json_extract",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON access on the semi-structured ``props`` column
    (``get_json_object`` — Catalyst built-in, no UDF)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@query(
    "events_sessionize",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, user_id)
),
sess AS (
  SELECT user_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, user_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id,
       count(DISTINCT session_id) AS n_sessions,
       count(*) AS n_events
FROM sess
GROUP BY user_id
ORDER BY user_id
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap) via lag + running sum
    — the batch twin of the streaming tier's ``session_window``. One
    shuffle on user_id; both windows and the final groupBy reuse the same
    partitioning (Catalyst collapses them into one exchange)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "user_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        e.withColumn(
            "is_new",
            F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("is_new").over(run))
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@query("extract_with_surrogate")  # rows-only: uuid()/now() nondeterministic
def extract_with_surrogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full extract projection (:207-219) verbatim on the
    events shape: uuid() surrogate key (P2/C1), explicit column list
    (P1), null guard (F1), metadata stamps current_date/
    current_timestamp (P5/C3/C4). Nondeterministic columns ⇒ rows-only
    (row count + schema checked; SURVEY.md §5 caveat)."""
    from ..functions import scalars

    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("ts").isNotNull())
        .select(
            scalars.surrogate_key().alias("record_id"),
            F.col("user_id").alias("entity_id"),
            F.col("ts").alias("event_timestamp"),
            "event_type",
            F.col("value").alias("numeric_field_1"),
        )
        .withColumn("processing_date", scalars.processing_date())
        .withColumn("load_timestamp", scalars.load_timestamp())
    )


# --------------------------------------------------------------------------
# Pipeline-health rollup — the reference README's "Monitoring & Alerting
# Foundation" metrics (success/failure rates, processing-time trends,
# throughput) as one aggregation over the audit-log shape
# (reference README.md:139-152; log schema :150-199). Events stand in
# for the log exactly as in status_report_window: purchase ≡ success
# run, error ≡ failed run, value ≡ processing seconds. Success rate is
# 1e6 fixed-point; the day-over-day trend is a lag window over the
# BOUNDED day relation (#calendar days — no full-relation funnel).
# --------------------------------------------------------------------------


@query(
    "pipeline_health_rollup",
    oracle="""
WITH runs AS (
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ok,
         value
  FROM events WHERE event_type IN ('purchase', 'error')
),
daily AS (
  SELECT day,
         CAST(sum(ok) AS BIGINT) AS n_success,
         CAST(sum(1 - ok) AS BIGINT) AS n_failure,
         CAST(floor(sum(ok) * 1000000.0 / count(*)) AS BIGINT) AS success_rate_q,
         CAST(floor(sum(CASE WHEN ok = 1 THEN value ELSE 0 END) * 100) AS BIGINT)
           AS proc_sec_q
  FROM runs GROUP BY day
)
SELECT day, n_success, n_failure, success_rate_q, proc_sec_q,
       success_rate_q
         - lag(success_rate_q) OVER (ORDER BY day) AS rate_delta_q
FROM daily ORDER BY day
""",
)
def pipeline_health_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    runs = e.filter(F.col("event_type").isin("purchase", "error")).select(
        F.to_date("ts").alias("day"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("ok"),
        "value",
    )
    daily = runs.groupBy("day").agg(
        F.sum("ok").alias("n_success"),
        F.sum(1 - F.col("ok")).alias("n_failure"),
        F.floor(F.sum("ok") * 1000000.0 / F.count(F.lit(1)))
        .cast("long")
        .alias("success_rate_q"),
        F.floor(
            F.sum(F.when(F.col("ok") == 1, F.col("value")).otherwise(0)) * 100
        )
        .cast("long")
        .alias("proc_sec_q"),
    )
    # Bounded relation: one row per calendar day.
    w = Window.orderBy("day")
    return (
        daily.withColumn(
            "rate_delta_q",
            F.col("success_rate_q") - F.lag("success_rate_q").over(w),
        )
        .orderBy("day")
    )
