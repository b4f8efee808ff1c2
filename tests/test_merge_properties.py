"""Property-based tests (Hypothesis) for the upsert/precombine merge —
the reference's one non-built-in semantic (SURVEY.md §1.4). Random
batches must always satisfy the Hudi-contract invariants the example
tests in test_merge.py check pointwise.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_hudi_etl_pipeline_spark.operators.merge import merge_upsert, precombine_batch

ROW = st.tuples(
    st.integers(min_value=0, max_value=9),      # key (few values → collisions)
    st.integers(min_value=0, max_value=99),     # precombine version
    st.integers(min_value=0, max_value=10**6),  # payload
)

BATCH = st.lists(ROW, min_size=0, max_size=25)

_SETTINGS = settings(
    max_examples=12,  # each example runs Spark jobs — keep the budget sane
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v int, payload int")


def _expected_merge(existing, batch):
    """Driver-side model: per key, max-precombine row wins; batch beats
    existing at equal precombine. Payload ambiguity at equal (k, v)
    within one side is resolved to the max payload for comparability."""
    best: dict[int, tuple[int, int, int]] = {}  # k -> (v, side, payload)
    for k, v, p in existing:
        cur = best.get(k)
        cand = (v, 0, p)
        if cur is None or (cand[0], cand[1], cand[2]) > (cur[0], cur[1], cur[2]):
            best[k] = cand
    for k, v, p in batch:
        cur = best.get(k)
        cand = (v, 1, p)
        if cur is None or (cand[0], cand[1], cand[2]) > (cur[0], cur[1], cur[2]):
            best[k] = cand
    return best


def _unique_per_key(rows):
    """Enforce the upsert-table invariant (one row per key — what this
    engine's own writes always produce): keep the max-(v, payload) row."""
    best: dict[int, tuple[int, int, int]] = {}
    for k, v, p in rows:
        if k not in best or (v, p) > (best[k][1], best[k][2]):
            best[k] = (k, v, p)
    return list(best.values())


@given(existing=BATCH, batch=BATCH)
@_SETTINGS
def test_merge_invariants(spark, existing, batch):
    # existing must satisfy the documented precondition (unique per key);
    # batch rows only need unique (k, v) so the win is deterministic
    # (Hudi tie behavior at equal precombine within a batch is
    # unspecified).
    existing = _unique_per_key(existing)
    batch = list({(k, v): (k, v, p) for k, v, p in batch}.values())

    e_df = _df(spark, existing) if existing else None
    b_df = _df(spark, batch)
    out = merge_upsert(e_df, b_df, keys=["k"], precombine="v").collect()

    # 1. One row per key.
    keys = [r["k"] for r in out]
    assert len(keys) == len(set(keys))

    # 2. Exactly the union of input keys survives.
    expected = _expected_merge(existing, batch)
    assert set(keys) == set(expected)

    # 3. Per key: the winning precombine value; ties favor the batch.
    for r in out:
        exp_v, exp_side, exp_p = expected[r["k"]]
        assert r["v"] == exp_v, (r, expected[r["k"]])
        assert r["payload"] == exp_p


@given(batch=BATCH)
@_SETTINGS
def test_precombine_idempotent(spark, batch):
    """precombine(precombine(b)) == precombine(b); output unique per key."""
    batch = list({(k, v): (k, v, p) for k, v, p in batch}.values())
    if not batch:
        return
    b_df = _df(spark, batch)
    once = precombine_batch(b_df, ["k"], "v")
    twice = precombine_batch(once, ["k"], "v")
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    assert len({t[0] for t in a}) == len(a)


@given(existing=BATCH, batch=BATCH)
@_SETTINGS
def test_merge_idempotent_rerun(spark, existing, batch):
    """Re-applying the same batch converges (the reference's rerun
    idempotence contract, README.md:80-84)."""
    existing = _unique_per_key(existing)
    batch = list({(k, v): (k, v, p) for k, v, p in batch}.values())
    e_df = _df(spark, existing) if existing else None
    b_df = _df(spark, batch)
    once = merge_upsert(e_df, b_df, keys=["k"], precombine="v")
    again = merge_upsert(once, b_df, keys=["k"], precombine="v")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, again.collect()))


# ---------------------------------------------------------------- MERGE INTO


def _expected_merge_into(target, source):
    """Driver-side ANSI MERGE model: matched+negative-source-v deletes,
    matched otherwise updates v/payload from source, unmatched target
    rows keep, unmatched source rows insert (negative-v sources insert
    too — the delete arm only applies to MATCHED rows, per the
    standard)."""
    src = {k: (v, p) for k, v, p in source}
    out = {}
    for k, v, p in target:
        if k in src:
            sv, sp = src[k]
            if sv < 0:
                continue  # matched delete
            out[k] = (sv, sp)  # matched update
        else:
            out[k] = (v, p)
    for k, (sv, sp) in src.items():
        if not any(tk == k for tk, _, _ in target):
            out[k] = (sv, sp)  # not-matched insert
    return {(k, v, p) for k, (v, p) in out.items()}


@given(
    target=st.lists(ROW, min_size=0, max_size=15),
    source=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=-5, max_value=99),  # negatives → delete arm
            st.integers(min_value=0, max_value=10**6),
        ),
        min_size=0,
        max_size=15,
    ),
)
@_SETTINGS
def test_merge_into_matches_model(spark, target, source):
    from spark_hudi_etl_pipeline_spark.operators.merge import merge_into

    target = _unique_per_key(target)
    # MERGE cardinality rule: one source row per key.
    source = list({k: (k, v, p) for k, v, p in source}.values())
    out = merge_into(
        _df(spark, target),
        _df(spark, source),
        ["k"],
        when_matched_update={"v": "s.v", "payload": "s.payload"},
        when_matched_delete="s.v < 0",
        when_not_matched_insert=True,
    )
    got = {(r["k"], r["v"], r["payload"]) for r in out.collect()}
    assert got == _expected_merge_into(target, source)


# ------------------------------------------------------------ timeline CDC


@given(
    commits=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=7),    # key
                st.integers(min_value=0, max_value=10**6),  # payload
                st.booleans(),                              # delete record
            ),
            min_size=0,
            max_size=6,
        ),
        min_size=2,
        max_size=4,
    ),
    since_idx=st.integers(min_value=0, max_value=2),
)
@_SETTINGS
def test_timeline_cdc_matches_model(spark, tmp_path, commits, since_idx):
    """Random monotone-precombine commit sequences: timeline_cdc's
    change rows must equal the diff of sequentially-applied states."""
    import uuid

    from spark_hudi_etl_pipeline_spark.operators.timeline import (
        commit_append,
        timeline_cdc,
    )

    path = str(tmp_path / f"cdc_{uuid.uuid4().hex}")
    # Monotone precombine: v = commit index (ties within a commit are
    # resolved identically by fold and model: delete loses to update at
    # equal precombine within the same commit via is-delete ordering —
    # avoid that ambiguity by deduping (key) per commit, keeping the
    # LAST occurrence, matching one-row-per-key batches).
    states = []  # model state after each commit: key -> (v, payload)
    model: dict[int, tuple[int, int]] = {}
    for i, batch in enumerate(commits):
        rows = {}
        for k, p, dele in batch:
            rows[k] = (k, i + 1, p, dele)  # precombine = commit instant
        if not rows:
            states.append(dict(model))
            continue
        df = spark.createDataFrame(
            list(rows.values()), "k int, v int, payload int, deleted boolean"
        )
        commit_append(spark, df, path, i + 1)
        for k, v, p, dele in rows.values():
            if dele:
                model.pop(k, None)
            else:
                model[k] = (v, p)
        states.append(dict(model))
    import os

    if not os.path.isdir(path):
        return  # every batch empty: nothing to check
    since = min(since_idx, len(states) - 1)
    before = states[since - 1] if since > 0 else {}
    after = states[-1]
    want = {}
    for k in set(before) | set(after):
        if k not in before:
            want[k] = "insert"
        elif k not in after:
            want[k] = "delete"
        elif before[k] != after[k]:
            want[k] = "update"
    got = {
        r["k"]: r["change_type"]
        for r in timeline_cdc(
            spark, path, ["k"], "v", since=since, delete_col="deleted"
        ).collect()
    }
    assert got == want


# ------------------------------------------------------ global-index upsert


@given(
    base=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),   # key (globally unique after dedup)
            st.integers(min_value=0, max_value=50),  # precombine
            st.sampled_from(["a", "b", "c"]),        # partition
        ),
        min_size=1,
        max_size=10,
    ),
    batch=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=50),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=6,
    ),
)
@_SETTINGS
def test_global_upsert_matches_model(spark, tmp_path, base, batch):
    """GLOBAL-index upsert: one row per key globally; the max-precombine
    row (batch beats table on ties) decides value AND partition."""
    import uuid

    from spark_hudi_etl_pipeline_spark.operators.tableops import (
        upsert_parquet_partitioned_global,
    )

    path = str(tmp_path / f"gu_{uuid.uuid4().hex}")
    base_rows = {k: (k, v, p) for k, v, p in base}           # unique keys
    batch_rows = {k: (k, v, p) for k, v, p in batch}
    bdf = spark.createDataFrame(list(base_rows.values()), "k int, v int, p string")
    upsert_parquet_partitioned_global(spark, bdf, path, ["k"], "v", "p")
    udf_ = spark.createDataFrame(list(batch_rows.values()), "k int, v int, p string")
    upsert_parquet_partitioned_global(spark, udf_, path, ["k"], "v", "p")
    model = dict(base_rows)
    for k, row in batch_rows.items():
        cur = model.get(k)
        if cur is None or row[1] >= cur[1]:  # batch wins ties
            model[k] = row
    got = {tuple(r) for r in spark.read.parquet(path).select("k", "v", "p").collect()}
    assert got == set(model.values())


# ------------------------------------------------------- partial update


@given(
    existing=st.lists(ROW, min_size=1, max_size=10),
    batch=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=99),
            st.one_of(st.none(), st.integers(min_value=0, max_value=10**6)),
        ),
        min_size=0,
        max_size=10,
    ),
)
@_SETTINGS
def test_partial_update_matches_model(spark, existing, batch):
    """PartialUpdate payload: a WINNING batch row's NULL payload keeps
    the table's value; losing/stale rows change nothing; inserts with
    NULL payload stay NULL."""
    from spark_hudi_etl_pipeline_spark.operators.merge import merge_upsert

    existing = _unique_per_key(existing)
    batch = list({k: (k, v, p) for k, v, p in batch}.values())
    out = merge_upsert(
        spark.createDataFrame(existing, "k int, v int, payload int"),
        spark.createDataFrame(batch, "k int, v int, payload int"),
        ["k"],
        "v",
        partial_update=True,
    )
    model = {k: (v, p) for k, v, p in existing}
    for k, v, p in batch:
        cur = model.get(k)
        if cur is None:
            model[k] = (v, p)
        elif v >= cur[0]:  # batch beats table on ties
            model[k] = (v, p if p is not None else cur[1])
    got = {r["k"]: (r["v"], r["payload"]) for r in out.collect()}
    assert got == model


@given(
    target=st.lists(ROW, min_size=0, max_size=15),
    source=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=-5, max_value=99),
            st.integers(min_value=0, max_value=10**6),
        ),
        min_size=0,
        max_size=15,
    ),
)
@_SETTINGS
def test_merge_into_null_delete_condition_matches_model(spark, target, source):
    """ANSI MERGE NULL semantics as a property: the delete condition is
    NULL when s.v == 0 — a NULL condition is NOT satisfied, so the
    update arm must apply (never a silent delete)."""
    from spark_hudi_etl_pipeline_spark.operators.merge import merge_into

    target = _unique_per_key(target)
    source = list({k: (k, v, p) for k, v, p in source}.values())
    out = merge_into(
        _df(spark, target),
        _df(spark, source),
        ["k"],
        when_matched_update={"v": "s.v", "payload": "s.payload"},
        when_matched_delete=(
            "CASE WHEN s.v = 0 THEN CAST(NULL AS BOOLEAN) ELSE s.v < 0 END"
        ),
        when_not_matched_insert=True,
    )
    got = {(r["k"], r["v"], r["payload"]) for r in out.collect()}
    # Model identical to _expected_merge_into: sv == 0 hits the NULL
    # branch which must behave exactly like False (update applies).
    assert got == _expected_merge_into(target, source)
