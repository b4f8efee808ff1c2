"""Data-quality tier (plans/quality_plans.py): the clean fixtures must
validate clean; profile stats must be internally consistent."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_hudi_etl_pipeline_spark.plans import QUERIES
from tests.conftest import SF_SMALL


def test_constraints_clean_fixture(spark):
    rows = {r["check_name"]: r["n_violations"]
            for r in QUERIES["validate_constraints"](spark, SF_SMALL).collect()}
    assert set(rows) == {
        "lineitem_fk_orders", "orders_custkey_not_null",
        "orders_pk_unique", "orders_status_accepted",
    }
    # The driver fixtures are referentially intact and key-unique.
    assert rows["lineitem_fk_orders"] == 0
    assert rows["orders_pk_unique"] == 0
    assert rows["orders_custkey_not_null"] == 0


def test_constraints_detect_seeded_violations(spark):
    """Break a copy of orders and run the checker on it: seeded dup
    keys / nulls / bad statuses / orphans must surface with exact
    counts."""
    from spark_hudi_etl_pipeline_spark.plans.quality_plans import (
        constraint_report,
    )
    from spark_hudi_etl_pipeline_spark.sources import load_table

    o = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    broken = (
        o.unionByName(
            o.filter((F.col("o_orderkey") % 503 != 0) | (F.col("o_orderkey") == 0))
            .orderBy("o_orderkey")
            .limit(3)
        )
        .withColumn(
            "o_custkey",
            F.when((F.col("o_orderkey") % 701 == 0) & (F.col("o_orderkey") > 0), None).otherwise(
                F.col("o_custkey")
            ),
        )
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") == 7, "X").otherwise(
                F.col("o_orderstatus")
            ),
        )
    )
    n_nulled = o.filter((F.col("o_orderkey") % 701 == 0) & (F.col("o_orderkey") > 0)).count()
    # Orphans: drop every order referenced by a lineitem key % 503 == 0.
    orphan_keys = li.filter((F.col("l_orderkey") % 503 == 0) & (F.col("l_orderkey") > 0))
    n_orphan_rows = orphan_keys.count()
    broken = broken.join(
        orphan_keys.select("l_orderkey").distinct(),
        broken["o_orderkey"] == F.col("l_orderkey"),
        "left_anti",
    )
    rows = {r["check_name"]: r["n_violations"]
            for r in constraint_report(broken, li).collect()}
    assert rows["orders_pk_unique"] == 3
    assert rows["orders_custkey_not_null"] >= n_nulled
    assert rows["orders_status_accepted"] >= 1
    assert rows["lineitem_fk_orders"] == n_orphan_rows


def test_profile_consistency(spark):
    from spark_hudi_etl_pipeline_spark.sources import load_table

    rows = {r["column_name"]: r
            for r in QUERIES["profile_orders"](spark, SF_SMALL).collect()}
    n = load_table(spark, SF_SMALL, "orders").count()
    for r in rows.values():
        assert 0 <= r["n_nulls"] <= n
        assert 1 <= r["n_distinct"] <= n
        assert r["min_s"] <= r["max_s"] or r["n_distinct"] == 1
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key


def test_embedding_dim_stats_shape(spark):
    rows = QUERIES["embedding_dim_stats"](spark, SF_SMALL).collect()
    assert [r["dim"] for r in rows] == list(range(1, 65))
    for r in rows:
        assert r["dim_min"] <= r["mean_q"] <= r["dim_max"]
        assert r["std_q"] >= 0


def test_quarantine_split_partition(spark):
    """good ∪ bad = input; good breaks no rule; multi-violation rows
    list every rule; NULL rule results fail closed."""
    from pyspark.sql import functions as F

    from spark_hudi_etl_pipeline_spark.plans.quality_plans import quarantine_split

    df = spark.createDataFrame(
        [(1, 10, "F"), (2, -5, "F"), (3, 10, "X"), (4, -1, "X"), (5, None, "O")],
        "k int, price int, status string",
    )
    good, bad = quarantine_split(
        df,
        {
            "price_positive": F.col("price") >= 0,
            "status_accepted": F.col("status").isin("F", "O", "P"),
        },
    )
    assert [r["k"] for r in good.collect()] == [1]
    got = {r["k"]: r["violations"] for r in bad.collect()}
    assert got == {
        2: "price_positive",
        3: "status_accepted",
        4: "price_positive,status_accepted",
        5: "price_positive",  # NULL comparison fails closed
    }
    assert good.count() + bad.count() == df.count()
