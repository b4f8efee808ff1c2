"""Benchmark harness: runs the headline query suite at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "passes": {name: [sec, ...]},
     "ab": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect overhead). First run of the session pays JVM/codegen
warmup; a throwaway warmup query absorbs it so per-query numbers reflect
steady-state execution.

Comparability protocol (r12, after the r9/r11 drift episodes — see
BASELINE.md §conventions): (a) the artifact records EVERY pass's wall per
query, not just the min, so a contended host window is visible inside the
artifact (uniformly inflated passes ⇒ contention; a single slow pass ⇒
scheduling noise); (b) the bench A/B's itself — it checks the previous
round's end-of-round snapshot into a temporary git worktree and alternates
probe sessions (prev, cur, prev, cur) on the shared probe set, reporting
per-query min walls and the cur/prev ratio. The interleaving is the point:
both trees sample the same contention windows, so the RATIO is comparable
even when absolute walls are not. Disable with SPARK_GRAFT_AB=0.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Headline suite: one representative per tier (aggregation, fact-fact
#: join, star join, window, sessionization, JSON, keyed upsert, as-of
#: join, event-time window, fuzzy dedup ×2, similarity, text scoring,
#: repetition filters, sequence packing, sliding distinct, constraint
#: validation, iterative PageRank, plus the lifecycle tier: global-index
#: upsert, timeline CDC pull, MERGE INTO).
#: CORE is the suite every round since r1 has measured — cross-round
#: wall-clock comparisons (VERDICT.md's core-19 table) depend on this
#: exact membership, so grow the bench by appending to LIFECYCLE (or a
#: new named tier), never by inserting into CORE.
#:
#: Cross-round caveat (round 7): pagerank_cust_supp_top20 reads ~2 s
#: HIGHER than r5/r6 because pagerank_ranks now owns and FREES its
#: cached edge relation (r6 advisor leak fix) — earlier rounds' passes
#: 2-3 silently reused the leaked cache and under-reported the honest
#: per-invocation cost. The iteration plan itself is unchanged
#: (exchange-free, pinned by tests/test_graph.py).
CORE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q9_profit_by_nation_year",
    "window_running_customer_spend",
    "events_sessionize",
    "events_json_extract",
    "upsert_precombine",
    "asof_purchase_prior_click",
    "window_tumbling_event_stats",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "knn_bruteforce_cosine",
    "text_quality_scores",
    "text_repetition_filters",
    "pack_sequences_token_budget",
    "rolling_7d_active_users",
    "validate_constraints",
    "pagerank_cust_supp_top20",
]

#: Lifecycle tier added in round 5 (timed separately as lifecycle_sec).
LIFECYCLE = [
    "upsert_global_index",
    "timeline_cdc_incremental",
    "merge_into_orders",
]

#: Curation tier added in round 7 (timed separately as curation_sec):
#: streaming incremental dedup through the fingerprint store, composed
#: IVF-PQ ANN, and sparse TF-IDF similarity search.
CURATION = [
    "streaming_dedup_store",
    "knn_ivfpq_adc",
    "tfidf_similar_docs",
]

#: Time-series + governance tier added late in round 7 (timed
#: separately as timeseries_sec): OHLC downsampling with the integer
#: EWMA kernel, the monthly cascade over daily partials, the
#: stats-sidecar pruned range scan, the k-anonymity release gate, and
#: PQ-blocked contrastive hard-negative mining.
#: End-of-round-7 reference numbers at sf0.1 (min-of-3, warm):
#: core19 18.9s, lifecycle 5.4s, curation 7.3s, timeseries 10.2s.
#: Note: stats_skipping_range_scan's bench time is dominated by its
#: own staging (clustered rewrite + sidecar build), not the pruned
#: scan — same convention as the lifecycle tier, which also times its
#: table-service writes.
TIMESERIES = [
    "events_ohlc_daily",
    "events_ohlc_monthly_cascade",
    "stats_skipping_range_scan",
    "k_anon_customer_release",
    "contrastive_hard_negatives",
]

#: Modal/retrieval tier added in round 9 (timed separately as
#: modal_sec): perceptual image dedup through the real raster decoder
#: (exact-hash clusters + banded rep join), Y4M scene cuts, WAV VAD
#: segmentation, BM25⊕dense RRF fusion, and the Holt forecast fold.
MODAL = [
    "image_ahash_neardup",
    "video_scene_cuts",
    "audio_vad_segments",
    "hybrid_rrf_retrieval",
    "events_holt_forecast",
]

#: Behavioral-analytics tier added in round 11 (timed separately as
#: behavior_sec): histogram-binned RFM segmentation, basket association
#: rules through the checkpointed (customer, brand) set, token-budget
#: greedy dataset selection, and the Markov transition matrix.
BEHAVIOR = [
    "rfm_customer_segments",
    "assoc_rules_brand_lift",
    "token_budget_selection",
    "event_transition_matrix",
]

#: Round-12 tier (timed separately as r12_sec): sessionized funnel
#: attribution (user-keyed fold + touch argmax) and Bloom-gated
#: decontamination (map-side position gate + exact verify).
R12 = [
    "funnel_attributed_conversions",
    "decontaminate_bloom_gate",
]

HEADLINE = CORE + LIFECYCLE + CURATION + TIMESERIES + MODAL + BEHAVIOR + R12

#: A/B probe set: one representative per tier, restricted to queries old
#: enough to exist in the previous snapshot's registry, including the four
#: probes the r11 judge adjudication used (q1, upsert_precombine,
#: events_sessionize, streaming_dedup_store). Kept small so the four
#: alternating sessions stay within the bench's runtime budget; the full
#: suite's per-pass walls (``passes``) carry the contention signal for
#: every other query.
AB_PROBES = [
    "q1_pricing_summary",
    "q9_profit_by_nation_year",
    "events_sessionize",
    "upsert_precombine",
    "dedup_minhash_lsh",
    "streaming_dedup_store",
    "knn_ivfpq_adc",
    "video_scene_cuts",
]


def _ab_interleaved(sf_dir: str) -> dict:
    """Interleaved previous-snapshot A/B (BASELINE.md §conventions).

    Checks the most recent ``end-of-round snapshot`` commit into a
    temporary detached worktree, then alternates single-JVM probe sessions
    (prev, cur, prev, cur — ``tools/ab_probe.py`` subprocesses, each with
    its own warmup) over :data:`AB_PROBES`. Returns per-tree per-query min
    walls and the cur/prev ratio. Never raises: on any failure (no git, no
    snapshot commit, subprocess error) returns ``{"error": ...}`` so the
    bench artifact still lands.
    """
    repo = os.path.dirname(os.path.abspath(__file__))
    sessions = int(os.environ.get("SPARK_GRAFT_AB_SESSIONS", "4"))
    passes = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "3"))
    wt = None
    try:
        # Anchored to the driver's snapshot-subject format — an
        # unanchored phrase grep would match ordinary commits whose
        # message merely MENTIONS the snapshot convention (it did).
        rev = subprocess.run(
            ["git", "-C", repo, "log", "-E",
             "--grep", r"^round [0-9]+: end-of-round snapshot",
             "--format=%H %s", "-n", "1"],
            capture_output=True, text=True, check=True, timeout=30,
        ).stdout.strip()
        if not rev:
            return {"error": "no end-of-round snapshot commit found"}
        prev_hash, prev_subject = rev.split(" ", 1)
        wt = os.path.join("/tmp", f"spark_graft_ab_{prev_hash[:12]}")
        if not os.path.isdir(wt):
            subprocess.run(
                ["git", "-C", repo, "worktree", "add", "--detach", wt, prev_hash],
                capture_output=True, text=True, check=True, timeout=120,
            )

        def run_session(tree: str) -> dict[str, float]:
            out = subprocess.run(
                [sys.executable, os.path.join(repo, "tools", "ab_probe.py"),
                 tree, sf_dir, str(passes), *AB_PROBES],
                capture_output=True, text=True, check=True, timeout=1800,
                cwd=tree,
            ).stdout.strip().splitlines()[-1]
            return json.loads(out)["timings"]

        mins: dict[str, dict[str, float]] = {"prev": {}, "cur": {}}
        order = ["prev", "cur"] * ((sessions + 1) // 2)
        for side in order[:sessions]:
            t = run_session(wt if side == "prev" else repo)
            for n, v in t.items():
                cur = mins[side].get(n)
                mins[side][n] = v if cur is None or v < cur else cur
        shared = sorted(set(mins["prev"]) & set(mins["cur"]))
        ratio = {
            n: round(mins["cur"][n] / mins["prev"][n], 3)
            for n in shared
            if mins["prev"][n] > 0
        }
        geo = 1.0
        for r in ratio.values():
            geo *= r
        geo = round(geo ** (1.0 / len(ratio)), 3) if ratio else None
        return {
            "prev_snapshot": prev_hash,
            "prev_subject": prev_subject,
            "sessions": sessions,
            "passes_per_session": passes,
            "prev_min_sec": mins["prev"],
            "cur_min_sec": mins["cur"],
            "ratio_cur_over_prev": ratio,
            "ratio_geomean": geo,
        }
    except Exception as exc:  # noqa: BLE001 — bench must always emit JSON
        return {"error": f"{type(exc).__name__}: {exc}"}
    finally:
        if wt is not None and os.path.isdir(wt):
            subprocess.run(
                ["git", "-C", repo, "worktree", "remove", "--force", wt],
                capture_output=True, timeout=60,
            )
            # A previously-killed bench can leave the dir registered as
            # prunable or not registered at all — make removal succeed
            # either way so the deterministic path is reusable.
            subprocess.run(
                ["git", "-C", repo, "worktree", "prune"],
                capture_output=True, timeout=60,
            )
            shutil.rmtree(wt, ignore_errors=True)


def _cpu_canary() -> float:
    """Fixed pure-CPU microbenchmark (single-thread, no allocation).
    Isolates PER-CORE clock / Python-interpreter drift only. It provably
    does NOT see the multi-core/JVM drift that moves the suite: the
    recorded r9 artifact carried canary 0.912 s (healthy) beside a
    uniformly 1.45× slower suite, and the judge's idle-box re-run read
    canary 0.851 s with a 68.6 s suite — anti-correlated. Kept for the
    narrow single-core signal; cross-round suite normalization uses
    spark_canary_sec instead (BASELINE.md §conventions)."""
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    return round(time.perf_counter() - t0, 3)


def _spark_canary(spark) -> float:
    """Fixed parallel canary: a constant local[N] Spark job (wide range
    scan → hash-shuffle aggregate → noop sink), min-of-3, timed exactly
    like a suite query on the already-warm JVM. Unlike the single-thread
    loop above, this rides the same multi-core JVM path as the suite —
    cgroup CPU quota, co-tenant contention, shuffle subsystem — so host
    drift moves it and the suite together. Cross-round comparisons of
    suite walls normalize by THIS number (r10 verdict ask #3)."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, 100_000_000, 1, 64)
            .select(
                (F.col("id") % 9973).alias("k"),
                (F.col("id") * 2654435761 % 1000003).alias("v"),
            )
            .groupBy("k")
            .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spark_hudi_etl_pipeline_spark.plans import QUERIES
    from spark_hudi_etl_pipeline_spark.session import get_spark_session

    spark = get_spark_session("spark-graft-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM + codegen + parquet footer caches, plus the Python/Arrow
    # worker pool (pandas-UDF queries would otherwise pay worker spinup
    # in their first measured run).
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")

    spark.range(0, 1024, 1, 32).select(_warm("id")).write.mode("overwrite").format(
        "noop"
    ).save()

    # The JVM's tiered JIT keeps the Arrow-serialization hot paths 3-4×
    # slower until they've run a few times (measured: identical LSH plans
    # 8-9s for the first 2-3 invocations of a fresh JVM, then 2.5s
    # steady, with the transition point varying per process). Execute the
    # UDF-heavy pipelines twice untimed so the timed passes below start
    # past the compilation cliff — a long-lived cluster job amortizes JIT
    # entirely, so steady state is the honest per-query cost.
    for name in ("dedup_minhash_lsh", "dedup_simhash", "knn_bruteforce_cosine"):
        for _ in range(2):
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

    # Three passes, report the per-query minimum. Two noise sources at
    # this scale: multi-job operator pipelines (LSH, merge) have ±40%
    # single-shot scheduling noise, and the JVM's tiered JIT keeps the
    # Arrow-serialization/codegen hot paths 3-4× slower until they've
    # executed a few times (measured: identical LSH plans ran 8-9s for
    # the first 2-3 invocations of a fresh JVM, then 2.5s steady —
    # min-of-2 straddles that boundary and reads bimodally across bench
    # invocations; min-of-3 lands past it). A long-lived cluster job
    # amortizes JIT entirely, so the steady-state number is the honest
    # per-query cost.
    per_pass: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _pass in range(3):
        for name in HEADLINE:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            per_pass[name].append(round(time.perf_counter() - t0, 3))
    timings = {name: min(v) for name, v in per_pass.items()}

    cpu_canary = _cpu_canary()
    spark_canary = _spark_canary(spark)

    # Release the suite JVM's executor threads before the A/B probe
    # sessions spin up their own JVMs — two concurrent local[32] JVMs
    # would contend with each other and corrupt the very measurement the
    # A/B exists to make.
    ab: dict | None = None
    if os.environ.get("SPARK_GRAFT_AB", "1") != "0":
        spark.stop()
        ab = _ab_interleaved(sf_dir)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num: float | str = float(sf)
    except ValueError:
        sf_num = sf
    core = CORE
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "core19_sec": round(sum(timings[n] for n in core), 3),
                "lifecycle_sec": round(
                    sum(timings[n] for n in LIFECYCLE), 3
                ),
                "curation_sec": round(
                    sum(timings[n] for n in CURATION), 3
                ),
                "timeseries_sec": round(
                    sum(timings[n] for n in TIMESERIES), 3
                ),
                "modal_sec": round(sum(timings[n] for n in MODAL), 3),
                "behavior_sec": round(sum(timings[n] for n in BEHAVIOR), 3),
                "r12_sec": round(sum(timings[n] for n in R12), 3),
                "cpu_canary_sec": cpu_canary,
                "spark_canary_sec": spark_canary,
                "queries": timings,
                "passes": per_pass,
                "ab": ab,
                "sf": sf_num,
            }
        )
    )


if __name__ == "__main__":
    main()
