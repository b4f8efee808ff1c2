"""VARIANT tier (plans/variant_plans.py + Spark 4 VariantType): type
fidelity through parse/extract/storage, null-safe access, and the
registered queries' planted-evidence semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_hudi_etl_pipeline_spark.plans.registry import QUERIES


def test_variant_typed_extraction_fidelity(spark):
    """Every JSON scalar type survives parse_json → variant_get with its
    value intact: nested long, exact double, string, bool, array index,
    and a deep path."""
    doc = (
        '{"i": 9007199254740993, "d": 0.1, "s": "x", "b": true,'
        ' "a": [10, 20, 30], "o": {"p": {"q": -5}}}'
    )
    r = (
        spark.range(1)
        .select(F.parse_json(F.lit(doc)).alias("v"))
        .selectExpr(
            "variant_get(v, '$.i', 'long') AS i",
            "variant_get(v, '$.d', 'double') AS d",
            "variant_get(v, '$.s', 'string') AS s",
            "variant_get(v, '$.b', 'boolean') AS b",
            "variant_get(v, '$.a[2]', 'long') AS a2",
            "variant_get(v, '$.o.p.q', 'long') AS q",
        )
        .first()
    )
    assert r["i"] == 9007199254740993  # > 2^53: long, not via-double
    assert r["d"] == 0.1
    assert r["s"] == "x"
    assert r["b"] is True
    assert r["a2"] == 30
    assert r["q"] == -5


def test_try_variant_get_missing_path_is_null_not_error(spark):
    r = (
        spark.range(1)
        .select(F.parse_json(F.lit('{"a": 1}')).alias("v"))
        .selectExpr(
            "try_variant_get(v, '$.missing', 'long') AS m",
            "try_variant_get(v, '$.a', 'long') AS a",
        )
        .first()
    )
    assert r["m"] is None
    assert r["a"] == 1


def test_variant_parquet_roundtrip_preserves_values(spark, tmp_path):
    """The binary variant encoding must survive a parquet write/read
    with typed extraction intact (the staged-table path the registered
    roundtrip query relies on)."""
    path = str(tmp_path / "v")
    (
        spark.range(100)
        .select(
            "id",
            F.parse_json(
                F.concat(F.lit('{"n": '), F.col("id").cast("string"), F.lit("}"))
            ).alias("v"),
        )
        .write.parquet(path)
    )
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["v"] == "variant"
    got = back.selectExpr("id", "variant_get(v, '$.n', 'long') AS n").collect()
    assert all(r["id"] == r["n"] for r in got)
    assert len(got) == 100


def test_heterogeneous_query_planted_shapes(spark):
    """purchase rows carry ONLY amount_cents docs; every other type
    carries ONLY k docs — the try_variant_get legs must not bleed."""
    rows = QUERIES["events_variant_heterogeneous"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_type = {r["event_type"]: r for r in rows}
    p = by_type["purchase"]
    assert p["purchase_cents"] is not None and p["purchase_cents"] > 0
    assert p["other_k"] is None  # no k doc on any purchase
    assert p["n_amount_docs"] == p["n_events"]
    for t, r in by_type.items():
        if t == "purchase":
            continue
        assert r["purchase_cents"] is None
        assert r["n_amount_docs"] == 0
        assert r["other_k"] is not None


@pytest.mark.parametrize("qname", ["events_variant_typed_extract"])
def test_variant_plan_is_udf_free_single_shuffle(spark, qname):
    """The variant path must stay JVM-side: no Python eval nodes, and
    the only exchange is the final aggregate's."""
    from spark_hudi_etl_pipeline_spark.pipeline.costlog import plan_shape

    df = QUERIES[qname](spark, "/root/testdata/sf0.001")
    shape = plan_shape(df)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    assert "ArrowEvalPython" not in buf.getvalue()
    assert "BatchEvalPython" not in buf.getvalue()
    assert shape["shuffle_exchanges"] <= 2  # partial agg + sort for orderBy
