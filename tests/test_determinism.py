"""Partition-count invariance: the fixed-point/decimal discipline claims
results are EXACTLY equal under any aggregation order. Run value-checked
representatives with a different shuffle-partition count (7 vs the
session's 32 — different partial-agg trees, different merge orders) and
require bit-identical rows, not just close ones.
"""

from __future__ import annotations

import pytest

from spark_hudi_etl_pipeline_spark.plans import QUERIES
from tests.conftest import SF_SMALL

#: Value-checked queries whose plans genuinely reshuffle (aggregates,
#: windows, iterative folds) — one per arithmetic discipline.
REPRESENTATIVES = [
    "q1_pricing_summary",          # decimal-exact money aggregation
    "supplier_pareto_cumshare",    # fixed-point prefix sums over value bins
    "pack_sequences_token_budget", # two-phase prefix-sum assignment
    "dsir_importance_weights",     # per-occurrence-quantized log-ratios
    "kmeans_lloyd_int",            # integer-exact iterative clustering
    "pagerank_cust_supp_top20",    # double recurrence + floor quantize
]


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_results_invariant_under_shuffle_partitions(spark, name):
    baseline = [tuple(r) for r in QUERIES[name](spark, SF_SMALL).collect()]
    assert baseline, f"{name} returned no rows at {SF_SMALL}"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        alt = [tuple(r) for r in QUERIES[name](spark, SF_SMALL).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert alt == baseline, f"{name} drifted under a different shuffle layout"
