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
# in iteration order. Round-12 window (FROZEN at round start, BEFORE any new
# registrations, per COVERAGE.md §Rotation): the 12 round-11 post-freeze
# registrations (the only oracle-bearing queries with no CORRECTNESS row in
# r1-r11), plus the 38 least-recently-attested oracle-bearing proven greens
# as cross-round regression canaries — computed as: every oracle-bearing,
# non-rows-only query sorted by (last driver green row, name); that takes
# the 4 remaining members of the 50-query r6 cohort
# (``unpivot_lineitem_measures`` … ``window_value_functions``) and the 34
# alphabetically-first of the r7 cohort. Rows-only-by-design queries are
# excluded from canary slots so every r12 row is hash-checkable. Any query
# registered later this round appends AFTER the window and rotates in r13.
# Everything NOT in the window still passes the identical local gate
# (``tools/oracle_check.py`` runs all). Once this window lands, cumulative
# driver attestation = 269/269 of the pre-r12 registry.
PRIORITY_WINDOW: list[str] = [
    # round-11 additions never driver-checked (12)
    "rfm_customer_segments",
    "event_transition_matrix",
    "seasonal_dow_profile",
    "assoc_rules_brand_lift",
    "radius_search_cosine",
    "token_budget_selection",
    "mmr_diversified_topk",
    "curriculum_difficulty_epochs",
    "source_kl_divergence",
    "events_burst_islands",
    "graph_label_propagation",
    "dedup_containment_pairs",
    # least-recently-attested oracle-bearing canaries (38): the 4 remaining
    # r6-cohort members + the 34 alphabetically-first of the r7 cohort
    "unpivot_lineitem_measures",
    "window_range_frame_spend",
    "window_running_customer_spend",
    "window_value_functions",
    "asof_purchase_prior_click",
    "clustered_scan_bands",
    "collect_statuses_by_segment",
    "corpus_curation_pipeline",
    "decimal_exact_totals",
    "dedup_exact_fingerprint",
    "dedup_incremental_batch",
    "dedup_ngram_jaccard",
    "dedup_resolve_canonical",
    "embedding_centroids",
    "embedding_neardup_blocked",
    "events_json_extract",
    "events_props_map",
    "events_sessionize",
    "extract_full_load",
    "incremental_agg_refresh",
    "ivf_upsert_probe",
    "knn_bruteforce_cosine",
    "leakage_safe_split",
    "multimodal_metadata_prune",
    "pagerank_cust_supp_top20",
    "profile_orders",
    "q11_important_part_value",
    "q15_top_supplier",
    "q16_supplier_relationship",
    "q20_majority_supplier",
    "q9_profit_by_nation_year",
    "recursive_ancestor_walk",
    "salted_join_segment_volume",
    "session_window_stats",
    "snapshot_diff_cdc",
    "status_report_window",
    "stratified_sample_events",
    "streaming_dedup_within_watermark",
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
