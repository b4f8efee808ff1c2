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
# in iteration order. Round-5 window (frozen at round start, BEFORE any new
# registrations, per COVERAGE.md §Rotation): the 46 queries ADDED in round 4
# after that round's window was fixed — lifecycle/timeline, MERGE INTO, SCD2,
# PQ/ADC, BPE, SemDeDup, quality/curation, streaming twins — i.e. every
# registered query with no CORRECTNESS row in r1-r4 (computed against the
# four ledgers; 42 oracle-bearing + 4 rows-only-by-design). The remaining 4
# slots backfill proven greens as cross-round regression canaries. Any query
# registered later this round appends AFTER the window and rotates in next
# round. Everything NOT in the window still passes the identical local gate
# (``tools/oracle_check.py`` runs all of them).
PRIORITY_WINDOW: list[str] = [
    # mid-round-4 batch
    "dpp_partition_pruned_join",
    "streaming_chained_rollup",
    "streaming_interval_join_outer",
    "wap_publish_clean",
    "scd2_user_status",
    "upsert_partial_update",
    "multimodal_audio_features",  # rows-only by design (binary decode)
    "multimodal_video_frames",  # rows-only by design (binary decode)
    "doc_ngram_novelty",
    "dedup_canonical_by_quality",
    "timeline_read_optimized",
    "timeline_realtime_snapshot",
    "embedding_pq_codes",
    "knn_pq_adc",
    "semantic_dedup_semdedup",
    "quality_model_filter",
    "bm25_rank_docs",
    "rolling_7d_active_hll",  # rows-only by design (HLL sketch)
    "mixture_epoch_plan",
    "source_contamination_matrix",
    "quarantine_split_orders",
    "dataset_card_report",
    # lifecycle / timeline batch
    "upsert_global_index",
    "insert_overwrite_restate",
    "timeline_restore_savepoint",
    "timeline_cleaned_read",
    "bulk_insert_global_sort",
    "timeline_cdc_incremental",
    "indexed_point_lookup",
    "streaming_timeline_ingest",
    "merge_into_orders",
    "scd2_point_in_time_join",
    "incremental_percentile_histogram",
    "secondary_index_lookup",
    "timeline_bootstrap_read",
    "timeline_cdc_images",
    "timeline_read_with_meta",
    "timeline_describe_history",
    "streaming_scd2_enrich",
    "upsert_record_indexed",
    "timeline_rollback_read",
    "recluster_scan_equivalence",
    "lakehouse_end_to_end",
    "timeline_auto_compact_read",
    "bpe_encode_fixed",
    "bpe_train_merges",  # rows-only by design (merge-order ties)
    # backfill: proven greens as cross-round regression canaries
    "q1_pricing_summary",
    "extract_incremental",
    "upsert_precombine",
    "dedup_exact_rows",
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
