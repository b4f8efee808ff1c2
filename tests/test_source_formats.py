"""Source/sink format round-trips beyond parquet: ORC, JSON lines, CSV.

The reference configures parquet AND orc codecs (SURVEY.md §2.1 S7,
reference :50-51) and README lists file-drop ingest among its sources;
every format here round-trips through the engine's session with schema
fidelity (CSV/JSON re-read with the explicit write schema — no
inference drift in a pipeline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_hudi_etl_pipeline_spark.sources import load_table
from tests.conftest import SF_SMALL


def _orders_subset(spark):
    return (
        load_table(spark, SF_SMALL, "orders")
        .filter(F.col("o_orderkey") < 100)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate")
    )


def _assert_same(a, b):
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_orc_roundtrip(spark, tmp_path):
    df = _orders_subset(spark)
    path = str(tmp_path / "orders_orc")
    df.write.mode("overwrite").orc(path)
    _assert_same(df, spark.read.orc(path))


def test_json_roundtrip(spark, tmp_path):
    df = _orders_subset(spark)
    path = str(tmp_path / "orders_json")
    df.write.mode("overwrite").json(path)
    _assert_same(df, spark.read.schema(df.schema).json(path))


def test_csv_roundtrip(spark, tmp_path):
    df = _orders_subset(spark)
    path = str(tmp_path / "orders_csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema(df.schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )
    _assert_same(df, back)
