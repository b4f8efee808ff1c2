"""Graph-analytics tier: PageRank over the customer–supplier bipartite
graph derived from orders⋈lineitem (an edge when a customer bought from
a supplier).

The iteration is the standard distributed formulation: contributions =
edges ⋈ ranks (shuffle on src), fold on dst — each iteration is one
shuffle on the natural key, state is O(nodes), never O(edges²). The
DuckDB oracle unrolls the same fixed iteration count as chained CTEs,
so even the iterative path is value-checked (rank quantized to 1e-9
fixed point; the undirected graph has no dangling nodes, keeping the
recurrence exact in both engines).

Connected components (operators/dedup.py) covers the other iterative
graph primitive; at cluster scale the iteration would checkpoint every
few rounds to truncate lineage — plan depth here is fixed (3) so chained
lazy joins are fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

_ITERS = 3
_DAMP = 0.85


def _oracle() -> str:
    lines = [
        "WITH e0 AS (",
        "  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,",
        "         's' || CAST(l.l_suppkey AS VARCHAR) AS dst",
        "  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey",
        "),",
        "e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),",
        "deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),",
        "n AS (SELECT count(*) AS n_nodes FROM deg),",
        "r0 AS (SELECT node, 1.0 / n.n_nodes AS r FROM deg, n),",
    ]
    for i in range(1, _ITERS + 1):
        lines.append(
            f"r{i} AS (SELECT e.dst AS node, "
            f"0.15 / min(n.n_nodes) + {_DAMP} * sum(r{i - 1}.r / deg.d) AS r "
            f"FROM e JOIN r{i - 1} ON e.src = r{i - 1}.node "
            f"JOIN deg ON deg.node = e.src, n GROUP BY e.dst),"
        )
    lines[-1] = lines[-1].rstrip(",")
    lines += [
        f"SELECT node, CAST(floor(r * 1000000000) AS BIGINT) AS rank_q",
        f"FROM r{_ITERS} ORDER BY rank_q DESC, node LIMIT 20",
    ]
    return "\n".join(lines)


@query("pagerank_cust_supp_top20", oracle=_oracle())
def pagerank_cust_supp_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank nodes after 3 synchronous iterations (damping
    0.85) on the undirected customer–supplier graph."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ranks = pagerank_ranks(li, o)
    return (
        ranks.select(
            "node",
            F.floor(F.col("r") * F.lit(1_000_000_000)).cast("long").alias("rank_q"),
        )
        .orderBy(F.desc("rank_q"), "node")
        .limit(20)
    )


def pagerank_ranks(li: DataFrame, o: DataFrame, iters: int = _ITERS) -> DataFrame:
    """Full rank vector after ``iters`` synchronous iterations — the
    DataFrame-level core (tests check rank-mass conservation on it)."""
    e0 = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    e = e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    n = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    # Degree is static — attach it to the edge list ONCE, so each
    # iteration is a single src-keyed join + dst-keyed fold (the edge
    # relation keeps its partitioning across iterations).
    ed = e.join(deg, e["src"] == deg["node"]).select("src", "dst", "d")
    # The degree-annotated edge list is consumed once per iteration;
    # without materialization the lazy plan recomputes the orders⋈lineitem
    # distinct + degree agg ``iters`` times. Same persist point as the
    # LSH banding (operators/dedup.py) — at cluster scale this is
    # persist(MEMORY_AND_DISK) on the co-partitioned edge relation.
    ed = ed.localCheckpoint(eager=True)
    ranks = deg.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("r")
    )
    for _ in range(iters):
        # The rank vector is O(nodes) — orders smaller than the edge
        # list; broadcast it so each iteration is map-side against the
        # materialized edges + ONE fold shuffle on dst. (At
        # billion-node scale you would instead co-partition ranks with
        # ed on src and keep a shuffle-hash join — same plan shape,
        # different join hint.)
        contrib = ed.join(F.broadcast(ranks), ed["src"] == ranks["node"]).select(
            F.col("dst"), (F.col("r") / F.col("d")).alias("contrib")
        )
        ranks = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(F.sum("contrib").alias("s"))
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (F.lit(0.15) / F.col("n_nodes") + F.lit(_DAMP) * F.col("s")).alias("r"),
            )
        )
    return ranks
