

def test_asof_forward_semantics_and_tiebreak(spark):
    """Forward as-of attaches the EARLIEST right row at or after the
    left timestamp; equal-timestamp right rows resolve by the tiebreak
    column; no following right row ⇒ nulls."""
    from spark_hudi_etl_pipeline_spark.operators.latest import (
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [("u", 10, "a"), ("u", 25, "b"), ("u", 99, "c"), ("v", 5, "d")],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u", 10, 100, 1), ("u", 10, 200, 2), ("u", 30, 300, 3)],
        "k string, ts long, val int, rid int",
    )
    out = {
        r["tag"]: (r["val"], r["rid"])
        for r in asof_join_forward(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_values=["val", "rid"], tiebreak="rid",
        ).collect()
    }
    assert out["a"] == (100, 1)   # equal-ts right visible; rid tie → lowest
    assert out["b"] == (300, 3)   # next following right row
    assert out["c"] == (None, None)  # nothing after
    assert out["d"] == (None, None)  # key with no right rows
