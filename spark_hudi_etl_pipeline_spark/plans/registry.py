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
# in iteration order. Round-8 window (frozen at round start, BEFORE any new
# registrations, per COVERAGE.md §Rotation): the 33 round-7 post-freeze
# registrations (the only ones with no CORRECTNESS row in r1-r7), plus the
# two multimodal decoders whose oracles were upgraded from rows-only to
# exact DuckDB SQL in r7 (re-rotation upgrades their ledger rows to
# hash-matched), plus the 15 least-recently-attested proven greens (last
# driver row r4, alphabetically first of that 36-query cohort) as
# cross-round regression canaries. Any query registered later this round
# appends AFTER the window and rotates in r9. Everything NOT in the window
# still passes the identical local gate (``tools/oracle_check.py`` runs all
# of them).
PRIORITY_WINDOW: list[str] = [
    # round-7 additions never driver-checked (33)
    "streaming_dedup_store",
    "knn_ivfpq_adc",
    "weighted_sample_pps",
    "bigram_lm_score",
    "dedup_shared_spans",
    "compaction_plan_monthly",
    "asof_purchase_next_click",
    "tfidf_similar_docs",
    "retention_expire_orders",
    "profile_drift_orders",
    "streaming_interval_join_anti",
    "vacuum_scan_invariance",
    "record_linkage_customers",
    "table_clone_divergence",
    "graph_triangle_top20",
    "multi_table_txn_sync",
    "branch_merge_isolation",
    "gdpr_erase_subject",
    "heavy_hitters_cms",
    "events_ohlc_daily",
    "events_ohlc_monthly_cascade",
    "streaming_ohlc_ingest",
    "stats_skipping_range_scan",
    "stats_metadata_group_counts",
    "k_anon_customer_release",
    "contrastive_hard_negatives",
    "table_checksum_orders",
    "doc_chunk_overlap_windows",
    "embedding_int8_codes",
    "symlink_manifest_read",
    "schema_evolution_upsert",
    "frequency_cap_events",
    "copurchase_pairs_topk",
    # multimodal decoders: oracles upgraded r7 rows-only -> exact (2)
    "multimodal_audio_features",
    "multimodal_video_frames",
    # least-recently-attested canaries (last driver row r4; 15)
    "attribution_last_touch",
    "cohort_retention_daily",
    "compacted_scan_invariance",
    "corpus_vocab_topk",
    "decontaminate_ngram_overlap",
    "dedup_chunk_apply",
    "dedup_chunk_exact",
    "doc_chunk_token_windows",
    "embedding_assign_nearest",
    "embedding_dim_stats",
    "embedding_quantize_int8",
    "events_anomaly_zscore",
    "events_gapfill_daily",
    "funnel_conversion_stages",
    "hist_token_counts",
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
