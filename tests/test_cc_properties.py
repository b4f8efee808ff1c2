"""Property-based tests (Hypothesis) for connected components — both
engines (alternating large-star/small-star, iterative label propagation)
against a pure-Python union-find ground truth on random graphs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_hudi_etl_pipeline_spark.operators.dedup import connected_components

_N = 24  # node universe (small → dense collision structure)

EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=_N - 1),
        st.integers(min_value=0, max_value=_N - 1),
    ),
    min_size=0,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=10,  # each example runs Spark jobs — keep the budget sane
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _union_find_labels(edges):
    parent = list(range(_N))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # Canonical = component minimum: root chains always end at the min
    # because unions always parent the larger root under the smaller.
    comp: dict[int, int] = {}
    for x in range(_N):
        r = find(x)
        comp[x] = min(comp.get(r, r), r)
    # find() with min-parenting already yields the min root, but make it
    # explicit: minimum over the member set.
    members: dict[int, list[int]] = {}
    for x in range(_N):
        members.setdefault(find(x), []).append(x)
    return {x: min(ms) for r, ms in members.items() for x in ms}


@given(edges=EDGES)
@_SETTINGS
def test_cc_both_engines_match_union_find(spark, edges):
    nodes = spark.createDataFrame([(i,) for i in range(_N)], "id long")
    e = spark.createDataFrame(edges, "id_a long, id_b long") if edges else (
        spark.createDataFrame([], "id_a long, id_b long")
    )
    expected = _union_find_labels(edges)
    for algo in ("star", "label_prop"):
        got = {
            r["id"]: r["canonical_id"]
            for r in connected_components(nodes, e, algorithm=algo).collect()
        }
        assert got == expected, f"{algo} diverged from union-find"
