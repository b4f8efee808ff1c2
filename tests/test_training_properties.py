"""Property-based tests (Hypothesis) for the two-phase prefix-sum
operators (sequence packing, round-robin sharding): random corpora must
satisfy the conservation/balance invariants for any token distribution,
including documents larger than the budget and single-doc corpora."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_hudi_etl_pipeline_spark.plans.training_plans import (
    _PACK_BUDGET,
    pack_sequences,
)

# (doc_id, n_tokens) — ids unique via dict; token counts cross the
# 512 budget so some docs exceed a whole sequence on their own.
CORPUS = st.dictionaries(
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=1, max_value=900),
    min_size=1,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=10,  # each example runs Spark jobs — keep the budget sane
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _docs_df(spark, corpus):
    rows = [(k, " ".join(["w"] * n)) for k, n in corpus.items()]
    return spark.createDataFrame(rows, "doc_id long, text string")


@given(corpus=CORPUS)
@_SETTINGS
def test_pack_conservation_and_offsets(spark, corpus):
    rows = pack_sequences(_docs_df(spark, corpus)).collect()
    total = sum(corpus.values())
    assert sum(r["total_tokens"] for r in rows) == total
    assert sum(r["n_docs"] for r in rows) == len(corpus)
    # Sequence ids are exactly the distinct floor(start/budget) values —
    # verify against a driver-side replay of the same (bucket, doc_id)
    # order.
    order = sorted(corpus.items(), key=lambda kv: (kv[0] % 8, kv[0]))
    seqs = set()
    start = 0
    for _k, n in order:
        seqs.add(start // _PACK_BUDGET)
        start += n
    assert {r["seq_id"] for r in rows} == seqs
