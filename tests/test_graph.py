"""Graph tier (plans/graph_plans.py): PageRank invariants the
fixed-point oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_hudi_etl_pipeline_spark.plans import QUERIES
from spark_hudi_etl_pipeline_spark.plans.graph_plans import pagerank_ranks
from spark_hudi_etl_pipeline_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_pagerank_mass_conserved(spark):
    """On an undirected (dangling-free) graph, total rank mass stays 1
    after every synchronous iteration."""
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    for iters in (1, 3):
        total = pagerank_ranks(li, o, iters=iters).agg(F.sum("r")).first()[0]
        assert abs(total - 1.0) < 1e-9


def test_pagerank_scale_path_same_ranks(spark):
    """The co-partitioned shuffle-hash path (what a billion-node graph
    would run, no rank-vector broadcast) produces the exact same ranks
    as the broadcast path, and its plan contains no broadcast of the
    rank vector."""
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    b = pagerank_ranks(li, o, broadcast_ranks=True)
    # materialize=False keeps the lazy recurrence plan inspectable (the
    # default collapses it to the checkpoint scan); the test then owns
    # the edge cache and clears it below.
    s = pagerank_ranks(li, o, broadcast_ranks=False, materialize=False)
    try:
        rb = {r["node"]: r["r"] for r in b.collect()}
        rs = {r["node"]: r["r"] for r in s.collect()}
        assert rb.keys() == rs.keys()
        # Same recurrence; only fp accumulation order may differ.
        assert max(abs(rb[k] - rs[k]) for k in rb) < 1e-12
        plan = s._jdf.queryExecution().executedPlan().toString()
        # Scope to the ITERATION subtree: everything before the cached
        # edge relation's own (one-time) build plan, which legitimately
        # broadcast-joins the degree table during materialization.
        iteration = plan.split("InMemoryRelation", 1)[0]
        assert "BroadcastHashJoin" not in iteration
        assert "ShuffledHashJoin" in plan
    finally:
        s.sparkSession.catalog.clearCache()


def test_pagerank_top20_shape(spark):
    rows = QUERIES["pagerank_cust_supp_top20"](spark, SF_SMALL).collect()
    assert len(rows) == 20
    qs = [r["rank_q"] for r in rows]
    assert qs == sorted(qs, reverse=True)
    assert all(q > 0 for q in qs)
    assert len({r["node"] for r in rows}) == 20
    # Suppliers have far higher degree than customers in this bipartite
    # graph — the top of the ranking should be supplier nodes.
    assert rows[0]["node"].startswith("s")


def test_pagerank_checkpointed_same_ranks_and_deep_run(spark):
    """checkpoint_every truncates lineage without changing values: a
    3-iteration checkpointed run is bit-identical to the lazy chain, and
    a 10-iteration run completes with a shallow post-checkpoint plan."""
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    lazy = {r["node"]: r["r"] for r in pagerank_ranks(li, o, iters=3).collect()}
    ck = {
        r["node"]: r["r"]
        for r in pagerank_ranks(li, o, iters=3, checkpoint_every=1).collect()
    }
    assert lazy == ck  # bit-identical: checkpoint cuts the plan, not math
    deep = pagerank_ranks(li, o, iters=10, checkpoint_every=2)
    total = deep.agg(F.sum("r")).first()[0]
    assert abs(total - 1.0) < 1e-9
    # Lineage is truncated: the final plan hangs off the last checkpoint
    # (≤ 2 iterations deep), not a 10-join chain.
    plan = deep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 10  # 2 iters × partial+final, + slack


def test_pagerank_iteration_is_exchange_free_on_broadcast_path(spark):
    """The per-iteration subtree must be BHJ + partial/final fold over
    the cached dst-partitioned edge relation with NO shuffle exchange
    (r5 verdict ask #6): the one dst-hash shuffle happens once at edge
    materialization, not once per iteration."""
    from pyspark.sql import functions as F

    from spark_hudi_etl_pipeline_spark.plans.graph_plans import pagerank_edges
    from spark_hudi_etl_pipeline_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    ed = pagerank_edges(li, o)
    try:
        # the r13 iteration shape: rank side carries rd = r/d; the fold
        # groups on (dst, dd) — dst is a subset of the grouping keys, so
        # the cached dst-hash layout still satisfies the distribution
        ranks = ed.select(F.col("dst").alias("node")).distinct().select(
            "node", F.lit(0.5).alias("rd")
        )
        step = (
            ed.join(F.broadcast(ranks), ed["src"] == ranks["node"])
            .select("dst", "dd", F.col("rd").alias("contrib"))
            .groupBy(F.col("dst").alias("node"), F.col("dd").alias("d"))
            .agg(F.sum("contrib").alias("s"))
        )
        plan = step._jdf.queryExecution().executedPlan().toString()
        # Depth-first print: everything before the cached relation's own
        # build plan is the iteration subtree.
        iteration = plan.split("InMemoryRelation", 1)[0]
        assert "BroadcastHashJoin" in iteration, plan
        assert iteration.count("HashAggregate") == 2, plan  # partial+final
        assert "Exchange" not in iteration, plan
        assert "InMemoryTableScan" in iteration, plan
    finally:
        ed.unpersist()


def test_pagerank_ranks_frees_edge_cache(spark):
    """pagerank_ranks owns the persisted edge relation and unpersists it
    once the final rank vector is materialized (r6 advisor: repeated
    invocations each pinned another cached copy for the session's
    lifetime). The DF cache registry must be as empty after the call as
    before it — localCheckpoint RDDs are ContextCleaner-collected on GC
    and are not in this registry, so the check is exact."""
    from spark_hudi_etl_pipeline_spark.plans.graph_plans import pagerank_ranks
    from spark_hudi_etl_pipeline_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cache = spark._jsparkSession.sharedState().cacheManager()
    assert cache.isEmpty(), "test requires a clean cache registry"
    ranks = pagerank_ranks(li, o, iters=2)
    assert cache.isEmpty(), "edge relation still pinned after return"
    # The returned vector is already materialized and fully usable.
    assert ranks.count() > 0


def _tri_counts(spark, edges):
    from spark_hudi_etl_pipeline_spark.plans.graph_plans import (
        triangle_participation,
    )

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "a long, b long"
    ).localCheckpoint(eager=True)
    return {
        r["node"]: r["tri_cnt"]
        for r in triangle_participation(pairs).collect()
    }


def test_triangle_participation_known_graphs(spark):
    """Exact counts on graphs with known triangle structure: K4 (every
    node in C(3,2)=3 triangles), a 4-path (triangle-free), and two
    triangles sharing one vertex (the shared vertex counts both)."""
    k4 = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    assert _tri_counts(spark, k4) == {1: 3, 2: 3, 3: 3, 4: 3}
    path = [(1, 2), (2, 3), (3, 4)]
    assert _tri_counts(spark, path) == {}
    bowtie = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)]
    assert _tri_counts(spark, bowtie) == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_triangle_single_enumeration_plan_shape(spark):
    """r14 pinned shape: the corner counts come from ONE triangle
    enumeration — a map-side explode of the (x, y, z) struct — not a
    3-way unionAll whose legs each re-plan (and re-execute) the whole
    wedge+closing join pipeline (the r14 before-plan showed three
    duplicated SortMergeJoin towers; 17 -> 7 s at sf0.1). Static plan:
    exactly one wedge SMJ, one shuffled-hash closing join (hash build on
    the smaller edge side — wedges grow up to O(m^1.5) and must not be
    sorted), one explode, no Union."""
    from spark_hudi_etl_pipeline_spark.plans.graph_plans import (
        triangle_participation,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long"
    ).localCheckpoint(eager=True)
    plan = (
        triangle_participation(pairs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("SortMergeJoin") == 1, plan
    assert plan.count("ShuffledHashJoin") == 1, plan
    assert plan.count("Generate explode") == 1, plan
    assert "Union" not in plan, plan


def test_triangle_orientation_bounds_fanout(spark):
    """A star plus one closing edge: the hub has the highest degree, so
    EVERY star edge orients toward it and the hub's out-degree is 0 —
    the wedge join fans out from leaves, never from the hub (the
    property that makes the plan survive hot keys at scale). The single
    triangle (hub, 1, 2) is still found exactly once."""
    star = [(0, i) for i in range(1, 9)] + [(1, 2)]
    counts = _tri_counts(spark, star)
    assert counts == {0: 1, 1: 1, 2: 1}
