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
# in iteration order. Round-10 window (FROZEN at round start, BEFORE any new
# registrations, per COVERAGE.md §Rotation): the 17 round-9 post-freeze
# registrations (the only queries with no CORRECTNESS row in r1-r9), plus
# the 33 least-recently-attested oracle-bearing proven greens as cross-round
# regression canaries — computed as: every oracle-bearing, non-rows-only
# query sorted by (last driver row, name); all 33 land in the r5 cohort
# (alphabetically first of the 36 queries whose last driver row is r5).
# Rows-only-by-design queries are excluded from canary slots so every r10
# row is hash-checkable. Any query registered later this round appends
# AFTER the window and rotates in r11. Everything NOT in the window still
# passes the identical local gate (``tools/oracle_check.py`` runs all).
# Once this window lands, cumulative driver attestation = 254/254 of the
# pre-r10 registry.
PRIORITY_WINDOW: list[str] = [
    # round-9 additions never driver-checked (17)
    "attribution_linear_multi_touch",
    "audio_vad_segments",
    "crossmodal_image_to_text_topk",
    "dedup_intra_doc_spans",
    "deletion_vector_read",
    "dp_noisy_counts_release",
    "dv_compaction_read",
    "events_holt_forecast",
    "gdpr_subject_access_export",
    "hybrid_rrf_retrieval",
    "image_ahash_neardup",
    "inverted_index_conjunctive",
    "knn_filtered_label",
    "kwic_snippets",
    "merge_full_sync_orders",
    "skew_diagnostic_events",
    "video_scene_cuts",
    # last-driver-row-r5 canaries, alphabetically first (33)
    "insert_overwrite_restate",
    "knn_pq_adc",
    "lakehouse_end_to_end",
    "merge_into_orders",
    "mixture_epoch_plan",
    "q1_pricing_summary",
    "quality_model_filter",
    "quarantine_split_orders",
    "recluster_scan_equivalence",
    "scd2_point_in_time_join",
    "scd2_user_status",
    "secondary_index_lookup",
    "semantic_dedup_semdedup",
    "source_contamination_matrix",
    "streaming_chained_rollup",
    "streaming_interval_join_outer",
    "streaming_scd2_enrich",
    "streaming_timeline_ingest",
    "timeline_auto_compact_read",
    "timeline_bootstrap_read",
    "timeline_cdc_images",
    "timeline_cdc_incremental",
    "timeline_cleaned_read",
    "timeline_describe_history",
    "timeline_read_optimized",
    "timeline_read_with_meta",
    "timeline_realtime_snapshot",
    "timeline_restore_savepoint",
    "timeline_rollback_read",
    "upsert_global_index",
    "upsert_partial_update",
    "upsert_precombine",
    "upsert_record_indexed",
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
