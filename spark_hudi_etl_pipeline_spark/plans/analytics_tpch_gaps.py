"""TPC-H-shaped queries q9/q11/q13/q16/q20 — the last classic shapes not yet
in the registry, adapted to the driver fixture schema (no ``partsupp`` table;
SURVEY.md §2.3/§2.4 joins + aggregation surface, README.md:324 "optimal joins").

Where the canonical query needs ``partsupp`` (supplycost/availqty), an
equivalent-shape proxy over ``lineitem``/``part`` is used so the *relational
shape* — multi-way star join, scalar-aggregate subquery threshold, NOT IN
anti join, correlated-aggregate semi join — is preserved and DuckDB-oracled.

Scale notes (100 TB):
- part/supplier/nation/region sides are broadcast everywhere; the only
  shuffles are fact-keyed (orderkey/partkey/suppkey) aggregations and the
  orders⋈lineitem SMJ, all AQE-coalesced/skew-split.
- q11/q20's "global threshold" scalar subqueries are windows over tiny
  *aggregate* outputs (|parts| rows), never over the fact table.
- q13's left outer join keeps the residual predicate inside the join
  condition (no post-join filter → nulls preserved exactly like the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# --------------------------------------------------------------------------
# Q9-shaped product-type profit: 5-way star join, profit expression with a
# cost proxy (2 * p_retailprice * l_quantity stands in for
# ps_supplycost * l_quantity — integer multiplier so no exact-binary .xx5
# sums arise; BASELINE.md's rounding-tie contract), grouped by nation × order year.
# Reference parity: the multi-dim join surface README.md:324 implies;
# generalizes pipeline_architecture.py:208-216 projection + :226 ordering.
# --------------------------------------------------------------------------


@query(
    "q9_profit_by_nation_year",
    oracle="""
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (
  SELECT n_name AS nation,
         year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) - 2 * p_retailprice * l_quantity AS amount
  FROM lineitem, part, supplier, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%widget%')
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_nation = F.broadcast(
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
            "s_suppkey", F.col("n_name").alias("nation")
        )
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 2 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        # Broadcast part-filter first: prunes the fact before the only
        # fact-fact shuffle (orders ⋈ lineitem on orderkey).
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supp_nation, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("nation", F.year("o_orderdate").alias("o_year"), amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# Q11-shaped important-part value: per-part value for one region's
# suppliers, kept only where value exceeds a scalar-aggregate threshold
# (HAVING > f(global agg)). The threshold subquery is a single-partition
# window over the per-part aggregate (|parts| rows), mirroring
# q15_top_supplier's decorrelation; 2×avg is scale-invariant so the query
# stays non-degenerate at every SF (canonical q11's sum×fraction threshold
# needs the fraction retuned per SF).
# --------------------------------------------------------------------------


@query(
    "q11_important_part_value",
    oracle="""
WITH value_by_part AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18, 2))
             * CAST(1 - l_discount AS DECIMAL(4, 2))) AS value
  FROM lineitem, supplier, nation, region
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_regionkey = r_regionkey AND r_name = 'ASIA'
  GROUP BY l_partkey),
t AS (SELECT sum(value) AS total, count(*) AS nparts FROM value_by_part)
SELECT l_partkey, CAST(value * 10000 AS BIGINT) AS part_value_q
FROM value_by_part, t
WHERE CAST(value AS DOUBLE) * nparts > 2.0 * CAST(total AS DOUBLE)
ORDER BY part_value_q DESC, l_partkey
""",
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = F.broadcast(
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    # Exact DECIMAL sums (prices/discounts are 2-decimal, so the casts
    # are lossless): per-part values and the grand total are integer-
    # scaled and bit-identical to the oracle's regardless of
    # accumulation order. The threshold test cross-multiplies
    # (value·n > 2·total ⇔ value > 2·avg) in doubles DERIVED from those
    # exact decimals — both engines compare identical bit patterns, so
    # membership can never flip on a last-ulp difference.
    value_by_part = (
        l.join(asia_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount")).cast("decimal(4,2)")
            ).alias("value")
        )
    )
    # Scalar threshold via empty-partition window over the tiny aggregate.
    w = Window.partitionBy()
    with_tot = value_by_part.withColumn(
        "total", F.sum("value").over(w)
    ).withColumn("nparts", F.count(F.lit(1)).over(w))
    return (
        with_tot.filter(
            F.col("value").cast("double") * F.col("nparts")
            > 2.0 * F.col("total").cast("double")
        )
        .select(
            "l_partkey",
            # Integer-scaled (×10⁴) BIGINT output: value is DECIMAL(·,4) so
            # the scaling is lossless, and the driver hashes BIGINT
            # identically across engines (unlike raw DECIMAL).
            (F.col("value") * 10000).cast("long").alias("part_value_q"),
        )
        .orderBy(F.desc("part_value_q"), F.asc("l_partkey"))
    )


# --------------------------------------------------------------------------
# Q13-shaped customer order-count distribution: LEFT OUTER join with the
# exclusion predicate inside the join condition (customers with zero
# qualifying orders must survive with c_count=0), then a second
# aggregation over the first — the classic count-of-counts histogram.
# --------------------------------------------------------------------------


@query(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        # count(col) skips the nulls the outer join produced — zero-order
        # customers land in the c_count=0 bucket, same as the oracle.
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q16-shaped supplier-relationship count: distinct-supplier count per part
# attribute triple, with a NOT IN anti-join exclusion list (canonical q16's
# complaint-supplier exclusion mapped to the low-balance suppliers the
# fixture schema provides). lineitem stands in for partsupp as the
# part↔supplier relation.
# --------------------------------------------------------------------------


@query(
    "q16_supplier_relationship",
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000
    ).select("s_suppkey")
    return (
        # NOT IN over a non-null key ≡ left_anti (no null-semantics trap);
        # exclusion list is tiny → broadcast anti join, no shuffle.
        l.join(F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


# --------------------------------------------------------------------------
# Q20-shaped majority-supplier semi join: suppliers whose shipped quantity
# of a widget part in 1996 exceeds half that part's total — canonical q20's
# `ps_availqty > 0.5 * sum(l_quantity)` correlated aggregate, re-expressed
# as per-(part,supplier) agg vs per-part window total, then IN (semi join)
# against supplier. Two nested aggregates + semi join, zero fact re-scans.
# --------------------------------------------------------------------------


@query(
    "q20_majority_supplier",
    oracle="""
WITH sq AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%widget%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey),
tot AS (SELECT l_partkey, sum(qty) AS total_qty FROM sq GROUP BY l_partkey)
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM sq JOIN tot USING (l_partkey)
  WHERE qty > 0.5 * total_qty)
ORDER BY s_suppkey
""",
)
def q20_majority_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    widget = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier")
    sq = (
        l.join(F.broadcast(widget), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    # Per-part total via window over the (partkey, suppkey) aggregate —
    # reuses sq's partitioning-by-partkey prefix instead of a second scan.
    majority = (
        sq.withColumn(
            "total_qty", F.sum("qty").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(majority), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_suppkey")
    )
