"""Query/oracle registry.

Every operator from SURVEY.md §2 (plus the north-star extensions) is
declared as a named query: a ``(spark, sf_dir) -> DataFrame`` callable
plus, where SQL-expressible, a DuckDB oracle SQL string over the same
parquet tables. ``__spark_entry__.py`` exposes these to the driver's
correctness gate.

Contract (BASELINE.md): every computed column aliased identically in the
Spark plan and the oracle SQL; nondeterministic columns never hashed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` ⇒ rows-only check (for
    genuinely non-SQL-expressible operators)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 entries of ``queries()``
# in iteration order. Round-13 window (FROZEN at round start, BEFORE any new
# registrations, per COVERAGE.md §Rotation and VERDICT.md r12 ask #1): the 4
# round-12 post-freeze registrations (the only oracle-bearing queries with no
# CORRECTNESS row in r1-r12; judge-verified green in the r12 verdict), plus
# the 46 least-recently-attested oracle-bearing proven greens as cross-round
# regression canaries — computed as: every oracle-bearing, non-rows-only
# query sorted by (last driver green row, name); that takes the 14 remaining
# members of the r7 cohort (``streaming_interval_join`` …
# ``watermark_lookup``) and the 32 alphabetically-first of the r8 cohort
# (``asof_purchase_next_click`` … ``knn_ivfpq_adc``). Rows-only-by-design
# queries are excluded from canary slots so every r13 row is hash-checkable.
# Any query registered later this round appends AFTER the window and rotates
# in r14. Everything NOT in the window still passes the identical local gate
# (``tools/oracle_check.py`` runs all). Once this window lands, cumulative
# driver attestation = 273/273 of the pre-r13 registry.
PRIORITY_WINDOW: list[str] = [
    # round-12 additions never driver-checked (4)
    "funnel_attributed_conversions",
    "decontaminate_bloom_gate",
    "events_seasonal_anomaly",
    "streaming_decontaminate_gate",
    # least-recently-attested oracle-bearing canaries (46): the 14 remaining
    # r7-cohort members + the 32 alphabetically-first of the r8 cohort
    "streaming_interval_join",
    "streaming_static_enrich",
    "streaming_tumbling_counts",
    "supplier_pareto_cumshare",
    "text_language_id",
    "text_quality_scores",
    "text_repetition_filters",
    "timeline_as_of",
    "train_test_split_hash",
    "upsert_file_indexed",
    "upsert_partition_pruned",
    "upsert_precombine_delete",
    "validate_constraints",
    "watermark_lookup",
    "asof_purchase_next_click",
    "attribution_last_touch",
    "bigram_lm_score",
    "branch_merge_isolation",
    "cohort_retention_daily",
    "compacted_scan_invariance",
    "compaction_plan_monthly",
    "contrastive_hard_negatives",
    "copurchase_pairs_topk",
    "corpus_vocab_topk",
    "decontaminate_ngram_overlap",
    "dedup_chunk_apply",
    "dedup_chunk_exact",
    "dedup_shared_spans",
    "doc_chunk_overlap_windows",
    "doc_chunk_token_windows",
    "embedding_assign_nearest",
    "embedding_dim_stats",
    "embedding_int8_codes",
    "embedding_quantize_int8",
    "events_anomaly_zscore",
    "events_gapfill_daily",
    "events_ohlc_daily",
    "events_ohlc_monthly_cascade",
    "frequency_cap_events",
    "funnel_conversion_stages",
    "gdpr_erase_subject",
    "graph_triangle_top20",
    "heavy_hitters_cms",
    "hist_token_counts",
    "k_anon_customer_release",
    "knn_ivfpq_adc",
]


def ordered_queries() -> dict[str, QueryFn]:
    """All registered queries, PRIORITY_WINDOW first (driver checks the
    first 50), then the rest in registration order. Fails loudly if a
    window name drifts out of sync with the registry."""
    missing = [n for n in PRIORITY_WINDOW if n not in QUERIES]
    if missing:
        raise ValueError(f"PRIORITY_WINDOW names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in PRIORITY_WINDOW}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    return ordered
