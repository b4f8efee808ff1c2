"""Per-query cost attribution into the audit surface.

The reference's audit table gestures at per-run observability —
"Performance Metrics: processing time trends", "Resource Metrics:
execution time and resource utilization" (reference README.md:148-160) —
but records only one wall-clock number per pipeline run. This module
attributes cost PER QUERY, Spark-first:

- **rows out** via :class:`pyspark.sql.Observation` — a plan-embedded
  aggregate collected as a side effect of the query's own action. No
  second job, no ``count()`` re-execution: at 100 TB re-counting a
  result to log it would double the query's cost.
- **jobs / tasks** from the :class:`SparkContext` status tracker,
  scoped by a per-run job group — the multi-core execution footprint
  the wall clock alone can't show (a 2-task query and a 2 000-task
  query can share a wall on an idle cluster and behave very
  differently on a contended one).
- **plan shape** (shuffle/broadcast exchanges, join strategies, pushed
  filters, codegen spans) parsed from the physical plan — the same
  extraction ``tools/plan_audit.py`` uses for PLANS.md, recorded per
  run so a plan regression (a new Exchange, a lost PushedFilters)
  shows up in the cost log even when the wall is noisy.

One row per profiled run is upserted into a keyed parquet cost table
through the same manifest-committed writer as the reference-schema audit
log (runlog.py), key ``(query_name, created_at)``.

Scale: everything recorded here is planning-scale (a handful of scalars
per run); the only corpus-scale work is the profiled query itself, which
runs exactly once.
"""

from __future__ import annotations

import contextlib
import io
import re
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.merge import upsert_parquet
from .runlog import now_ms

COST_SCHEMA = StructType(
    [
        StructField("query_name", StringType(), nullable=False),
        StructField("rows_out", LongType(), nullable=True),
        StructField("wall_sec", DoubleType(), nullable=False),
        StructField("n_jobs", IntegerType(), nullable=True),
        StructField("n_tasks", IntegerType(), nullable=True),
        StructField("shuffle_exchanges", IntegerType(), nullable=False),
        StructField("broadcast_exchanges", IntegerType(), nullable=False),
        StructField("broadcast_hash_joins", IntegerType(), nullable=False),
        StructField("sort_merge_joins", IntegerType(), nullable=False),
        StructField("pushed_filters", IntegerType(), nullable=False),
        StructField("codegen_spans", IntegerType(), nullable=False),
        StructField("created_at", LongType(), nullable=False),
    ]
)


def plan_shape(df: DataFrame) -> dict[str, int]:
    """Scale-critical physical-plan counters (the PLANS.md extraction,
    inlined so the engine doesn't import from tools/)."""
    buf_s, buf_f, buf_c = io.StringIO(), io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(buf_s):
        df.explain()
    with contextlib.redirect_stdout(buf_f):
        df.explain("formatted")
    # Under AQE no pre-execution plan text carries codegen spans (the
    # AdaptiveSparkPlan wrapper hides its subtrees until runtime), so
    # the count is taken from the NON-adaptive physical plan — same
    # operators, same codegen fusion boundaries, available at plan
    # time. AQE is restored immediately; the toggle affects only this
    # explain's planning.
    sess = df.sparkSession
    aqe = sess.conf.get("spark.sql.adaptive.enabled")
    try:
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        # fresh plan node: the original df's QueryExecution is memoized
        # from the explains above, so it would ignore the AQE toggle.
        with contextlib.redirect_stdout(buf_c):
            df.select("*").explain("codegen")
    finally:
        sess.conf.set("spark.sql.adaptive.enabled", aqe)
    simple, formatted = buf_s.getvalue(), buf_f.getvalue()
    found = re.search(r"Found (\d+) WholeStageCodegen subtrees", buf_c.getvalue())
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)
    return {
        "shuffle_exchanges": len(
            re.findall(r"Exchange (?:hash|range)partitioning", simple)
        ),
        "broadcast_exchanges": simple.count("BroadcastExchange"),
        "broadcast_hash_joins": simple.count("BroadcastHashJoin"),
        "sort_merge_joins": simple.count("SortMergeJoin"),
        "pushed_filters": sum(
            len([p for p in grp.split(",") if p.strip()]) for grp in pushed
        ),
        "codegen_spans": int(found.group(1)) if found else 0,
    }


def profile_run(
    spark: SparkSession, df: DataFrame, query_name: str
) -> dict[str, object]:
    """Execute ``df`` end-to-end through the noop sink and return its
    cost-attribution row: observed rows out, wall, job/task counts for
    the run's job group, and the plan-shape counters."""
    obs = Observation(f"cost_{query_name}")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows_out"))
    shape = plan_shape(df)
    sc = spark.sparkContext
    group = f"cost:{query_name}:{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, f"cost attribution: {query_name}")
    t0 = time.perf_counter()
    try:
        observed.write.mode("overwrite").format("noop").save()
    finally:
        sc.setJobGroup(None, None)
    wall = time.perf_counter() - t0
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group) or []
    n_tasks = 0
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                n_tasks += int(sinfo.numTasks)
    return {
        "query_name": query_name,
        "rows_out": int(obs.get["rows_out"]),
        "wall_sec": round(wall, 3),
        "n_jobs": len(job_ids),
        "n_tasks": n_tasks,
        **shape,
        "created_at": now_ms(),
    }


def write_cost_entry(
    spark: SparkSession, cost_path: str, entry: dict[str, object]
) -> None:
    """Upsert one attribution row, keyed ``(query_name, created_at)`` —
    the same manifest-committed keyed writer as the audit log."""
    row = [tuple(entry[f.name] for f in COST_SCHEMA.fields)]
    batch = spark.createDataFrame(row, COST_SCHEMA)
    upsert_parquet(
        spark,
        batch,
        cost_path,
        keys=["query_name", "created_at"],
        precombine="created_at",
    )


def cost_report(spark: SparkSession, cost_path: str) -> DataFrame:
    """Per-query rollup over the cost table: run count, wall stats, and
    the LATEST run's plan-shape counters (argmax by created_at — a plan
    regression shows as a counter change between report snapshots)."""
    log = spark.read.parquet(cost_path)
    w_latest = F.max(F.struct("created_at", "shuffle_exchanges")).alias("_l")
    return (
        log.groupBy("query_name")
        .agg(
            F.count(F.lit(1)).alias("runs"),
            F.min("wall_sec").alias("min_wall_sec"),
            F.avg("wall_sec").alias("avg_wall_sec"),
            F.max("rows_out").alias("rows_out"),
            w_latest,
        )
        .select(
            "query_name",
            "runs",
            "min_wall_sec",
            "avg_wall_sec",
            "rows_out",
            F.col("_l.shuffle_exchanges").alias("latest_shuffle_exchanges"),
        )
        .orderBy("query_name")
    )
