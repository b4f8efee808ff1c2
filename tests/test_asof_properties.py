"""Property-based test for the union-window as-of join: random event
sets must match a brute-force driver-side model (latest right row with
right_ts <= left_ts per key)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_hudi_etl_pipeline_spark.operators.latest import asof_join

LEFT_ROW = st.tuples(
    st.integers(min_value=0, max_value=4),    # key
    st.integers(min_value=0, max_value=50),   # left ts
)
RIGHT_ROW = st.tuples(
    st.integers(min_value=0, max_value=4),    # key
    st.integers(min_value=0, max_value=50),   # right ts
    st.integers(min_value=0, max_value=999),  # value
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _model(left, right):
    """For each left row: value of the right row with max right_ts <= ts
    (ties on right_ts impossible — deduped per (key, ts))."""
    out = {}
    for lid, (k, ts) in enumerate(left):
        best = None
        for rk, rts, rv in right:
            if rk == k and rts <= ts and (best is None or rts > best[0]):
                best = (rts, rv)
        out[lid] = best[1] if best else None
    return out


@given(
    left=st.lists(LEFT_ROW, min_size=1, max_size=20),
    right=st.lists(RIGHT_ROW, min_size=0, max_size=20),
)
@_SETTINGS
def test_asof_matches_bruteforce(spark, left, right):
    # Dedup right per (key, ts) keeping max value — determinism contract
    # (same normalization the registered query applies).
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())
    left_rows = [(i, k, t) for i, (k, t) in enumerate(left)]
    l_df = spark.createDataFrame(left_rows, "lid int, k int, ts int")
    r_df = (
        spark.createDataFrame(right, "k int, ts int, val int")
        if right
        else spark.createDataFrame([], "k int, ts int, val int")
    )
    out = asof_join(
        l_df, r_df, on=["k"], left_ts="ts", right_ts="ts", right_values=["val"]
    ).collect()
    got = {r["lid"]: r["val"] for r in out}
    assert got == _model(left, right)
    assert len(out) == len(left)  # left-join cardinality preserved
