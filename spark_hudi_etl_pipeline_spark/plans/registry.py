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
# in iteration order. Round-6 window (frozen at round start, BEFORE any new
# registrations, per COVERAGE.md §Rotation): the 10 queries added in round 5
# after that round's freeze — the only registrations with no CORRECTNESS row
# in r1-r5 (computed against the five ledgers; all oracle-bearing) — plus 40
# least-recently-attested proven greens (last driver rows r2/r3) as
# cross-round regression canaries. Any query registered later this round
# appends AFTER the window and rotates in next round. Everything NOT in the
# window still passes the identical local gate (``tools/oracle_check.py``
# runs all of them).
PRIORITY_WINDOW: list[str] = [
    # round-5 additions never driver-checked (10)
    "pipeline_health_rollup",
    "streaming_interval_join_semi",
    "kmeans_lloyd_int",
    "streaming_quality_filter",
    "dsir_importance_weights",
    "dsir_weights_hashed",
    "decontaminate_apply",
    "dsir_resample_topk",
    "events_fill_forward",
    "cdc_apply_downstream",
    # least-recently-attested canaries (last driver row r2/r3)
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "topk_orders_by_price",
    "rollup_returnflag_linestatus",
    "cube_status_priority",
    "window_running_customer_spend",
    "latest_order_per_customer",
    "distinct_counts",
    "set_ops_segments",
    "q6_revenue_forecast",
    "q4_late_shipment_priority",
    "q7_nation_volume",
    "q10_returned_item_revenue",
    "q12_priority_class_by_status",
    "q14_promo_revenue_pct",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "q22_idle_high_balance",
    "q2_top_supplier_per_nation",
    "range_join_price_bands",
    "salted_agg_order_priority",
    "pivot_status_by_segment",
    "percentiles_order_price",
    "stats_lineitem_moments",
    "string_functions_surface",
    "unpivot_lineitem_measures",
    "bag_set_ops_custkeys",
    "posexplode_doc_tokens",
    "datetime_functions_surface",
    "grouping_sets_status_priority",
    "q8_market_share",
    "q21_sole_late_supplier",
    "window_range_frame_spend",
    "ntile_balance_quartiles",
    "window_value_functions",
    "mom_revenue_growth",
    "q13_customer_distribution",
    "q3_shipping_priority",
    "q5_regional_revenue",
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
