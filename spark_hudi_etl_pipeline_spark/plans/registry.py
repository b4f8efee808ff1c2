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
# in iteration order. Round-9 window (frozen at round start, BEFORE any new
# registrations, per COVERAGE.md §Rotation): the 13 round-8 post-freeze
# registrations (the only ones with no CORRECTNESS row in r1-r8), plus the
# 37 least-recently-attested oracle-bearing proven greens as cross-round
# regression canaries — all 26 non-rows-only queries whose last driver row
# is r4 (this upgrades `dedup_minhash_lsh`/`dedup_simhash`/`knn_lsh_ann`/
# `multimodal_decode_features`, whose old ledger rows are rows-only but
# which gained exact oracles in r7/r8, to hash-matched rows), plus the 11
# alphabetically-first of the r5 cohort. Rows-only-by-design queries are
# excluded from canary slots so every r9 row is hash-checkable (their
# deliberate rows-only ledger rows already exist from r4). Any query
# registered later this round appends AFTER the window and rotates in r10.
# Everything NOT in the window still passes the identical local gate
# (``tools/oracle_check.py`` runs all of them).
PRIORITY_WINDOW: list[str] = [
    # round-8 additions never driver-checked (13)
    "ann_recall_lsh_vs_exact",
    "asof_prior_click_tolerance",
    "dedup_edit_distance_blocked",
    "dedup_minhash_store_probe",
    "events_anomaly_mad",
    "events_twap_daily",
    "hidden_partition_day_scan",
    "kfold_split_documents",
    "knn_matryoshka_trunc16",
    "l_diversity_customer_release",
    "partition_evolution_scan",
    "streaming_minhash_store",
    "zorder_nd_scan_bands",
    # rows-only->oracle ledger upgrades + last-driver-row-r4 canaries (26)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "incremental_join_refresh",
    "knn_ivf_ann",
    "knn_lsh_ann",
    "multimodal_decode_features",
    "pack_sequences_token_budget",
    "pmi_collocations_topk",
    "rolling_7d_active_users",
    "sample_by_quality_bucket",
    "sample_fixed_per_source",
    "shard_round_robin",
    "source_mixture_weights",
    "streaming_sliding_counts",
    "streaming_stateful_user_stats",
    "text_boilerplate_fraction",
    "text_encode_ids",
    "text_pii_redaction",
    "text_tfidf_top_terms",
    "text_token_stats",
    "text_unigram_logprob",
    "upsert_bloom_indexed",
    "window_rank_distribution",
    "window_sliding_event_counts",
    "window_tumbling_event_stats",
    "bm25_rank_docs",
    # last-driver-row-r5 canaries, alphabetically first (11)
    "bpe_encode_fixed",
    "bulk_insert_global_sort",
    "dataset_card_report",
    "dedup_canonical_by_quality",
    "dedup_exact_rows",
    "doc_ngram_novelty",
    "dpp_partition_pruned_join",
    "embedding_pq_codes",
    "extract_incremental",
    "incremental_percentile_histogram",
    "indexed_point_lookup",
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
