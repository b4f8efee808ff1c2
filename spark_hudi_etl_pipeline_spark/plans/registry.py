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
# in iteration order. Round-11 window (FROZEN at round start, BEFORE any new
# registrations, per COVERAGE.md §Rotation): the 3 round-10 post-freeze
# registrations (the only oracle-bearing queries with no CORRECTNESS row in
# r1-r10), plus the 47 least-recently-attested oracle-bearing proven greens
# as cross-round regression canaries — computed as: every oracle-bearing,
# non-rows-only query sorted by (last driver green row, name); that takes
# the r5 cohort's one remaining member (``wap_publish_clean``) and the 46
# alphabetically-first of the 50-query r6 cohort. Rows-only-by-design
# queries are excluded from canary slots so every r11 row is hash-checkable.
# Any query registered later this round appends AFTER the window and rotates
# in r12. Everything NOT in the window still passes the identical local gate
# (``tools/oracle_check.py`` runs all). Once this window lands, cumulative
# driver attestation = 257/257 of the pre-r11 registry.
PRIORITY_WINDOW: list[str] = [
    # round-10 additions never driver-checked (3)
    "events_cusum_changepoint",
    "funnel_windowed_sequence",
    "winsorized_event_stats",
    # least-recently-attested oracle-bearing canaries (47): the last
    # r5-cohort member + the 46 alphabetically-first of the r6 cohort
    "wap_publish_clean",
    "bag_set_ops_custkeys",
    "cdc_apply_downstream",
    "cube_status_priority",
    "datetime_functions_surface",
    "decontaminate_apply",
    "distinct_counts",
    "dsir_importance_weights",
    "dsir_resample_topk",
    "dsir_weights_hashed",
    "events_fill_forward",
    "grouping_sets_status_priority",
    "join_anti_customers_without_orders",
    "join_semi_customers_with_orders",
    "kmeans_lloyd_int",
    "latest_order_per_customer",
    "mom_revenue_growth",
    "ntile_balance_quartiles",
    "percentiles_order_price",
    "pipeline_health_rollup",
    "pivot_status_by_segment",
    "posexplode_doc_tokens",
    "q10_returned_item_revenue",
    "q12_priority_class_by_status",
    "q13_customer_distribution",
    "q14_promo_revenue_pct",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "q21_sole_late_supplier",
    "q22_idle_high_balance",
    "q2_top_supplier_per_nation",
    "q3_shipping_priority",
    "q4_late_shipment_priority",
    "q5_regional_revenue",
    "q6_revenue_forecast",
    "q7_nation_volume",
    "q8_market_share",
    "range_join_price_bands",
    "rollup_returnflag_linestatus",
    "salted_agg_order_priority",
    "set_ops_segments",
    "stats_lineitem_moments",
    "streaming_interval_join_semi",
    "streaming_quality_filter",
    "string_functions_surface",
    "topk_orders_by_price",
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
