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
# in iteration order. Round-7 window (frozen at round start, BEFORE any new
# registrations, per COVERAGE.md §Rotation): the 2 queries added in round 6
# after that round's freeze — the only registrations with no CORRECTNESS row
# in r1-r6 (computed against the six ledgers; both oracle-bearing) — plus the
# 48 least-recently-attested proven greens (last driver rows r3, plus the 5
# oldest r4 rows) as cross-round regression canaries. Any query registered
# later this round appends AFTER the window and rotates in next round.
# Everything NOT in the window still passes the identical local gate
# (``tools/oracle_check.py`` runs all of them).
PRIORITY_WINDOW: list[str] = [
    # round-6 additions never driver-checked (2)
    "dedup_incremental_batch",
    "ivf_upsert_probe",
    # least-recently-attested canaries (last driver row r3, then oldest r4)
    "events_props_map",
    "collect_statuses_by_segment",
    "q15_top_supplier",
    "supplier_pareto_cumshare",
    "decimal_exact_totals",
    "q9_profit_by_nation_year",
    "q11_important_part_value",
    "q16_supplier_relationship",
    "q20_majority_supplier",
    "extract_full_load",
    "watermark_lookup",
    "status_report_window",
    "events_sessionize",
    "asof_purchase_prior_click",
    "streaming_tumbling_counts",
    "multimodal_metadata_prune",
    "session_window_stats",
    "streaming_dedup_within_watermark",
    "streaming_interval_join",
    "upsert_precombine_delete",
    "upsert_partition_pruned",
    "upsert_file_indexed",
    "streaming_static_enrich",
    "dedup_exact_fingerprint",
    "dedup_ngram_jaccard",
    "dedup_resolve_canonical",
    "leakage_safe_split",
    "incremental_agg_refresh",
    "snapshot_diff_cdc",
    "timeline_as_of",
    "clustered_scan_bands",
    "train_test_split_hash",
    "stratified_sample_events",
    "knn_bruteforce_cosine",
    "embedding_neardup_blocked",
    "embedding_centroids",
    "text_quality_scores",
    "text_language_id",
    "text_repetition_filters",
    "corpus_curation_pipeline",
    "validate_constraints",
    "profile_orders",
    "pagerank_cust_supp_top20",
    "approx_distinct_customers",
    "approx_percentiles_price",
    "salted_join_segment_volume",
    "recursive_ancestor_walk",
    "events_json_extract",
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
