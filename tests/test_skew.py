"""Skew operators: salted rewrites must be correctness-invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_hudi_etl_pipeline_spark.operators.skew import salted_join, salted_sum_count
from spark_hudi_etl_pipeline_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_salted_agg_matches_plain(spark):
    o = load_table(spark, SF_SMALL, "orders")
    plain = {
        r["o_orderstatus"]: (round(r["s"], 2), r["n"])
        for r in o.groupBy("o_orderstatus")
        .agg(F.sum("o_totalprice").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["o_orderstatus"]: (round(r["s"], 2), r["n"])
        for r in salted_sum_count(
            o, keys=["o_orderstatus"], sums={"o_totalprice": "s"},
            count_alias="n", n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    o = load_table(spark, SF_SMALL, "orders")
    c = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_mktsegment")
    plain = sorted(
        (r["o_orderkey"], r["c_mktsegment"])
        for r in o.join(c, o.o_custkey == c.c_custkey).collect()
    )
    salted = sorted(
        (r["o_orderkey"], r["c_mktsegment"])
        for r in salted_join(
            o.withColumnRenamed("o_custkey", "c_custkey"), c,
            on=["c_custkey"], n_salts=8,
        ).collect()
    )
    assert salted == plain
