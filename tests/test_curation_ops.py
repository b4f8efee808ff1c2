"""Invariant tests for the round-4 curation/ETL additions: SCD2
dimension build, linear quality-model filter, n-gram novelty scoring.
Value-level cross-engine equality is covered by the oracle gate
(tools/oracle_check.py); these assert the semantic invariants the gate
can't express."""

from __future__ import annotations

from collections import defaultdict

from spark_hudi_etl_pipeline_spark.plans import QUERIES

from tests.conftest import SF_SMALL


def test_scd2_intervals_partition_the_timeline(spark):
    """Per user: versions are chronologically chained (each version's
    effective_to equals the next version's effective_from), exactly one
    open current row, and adjacent versions always change status."""
    rows = QUERIES["scd2_user_status"](spark, SF_SMALL).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    assert by_user
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r["effective_from"])
        currents = [v for v in vs if v["is_current"]]
        assert len(currents) == 1 and currents[0] is vs[-1]
        for a, b in zip(vs, vs[1:]):
            assert a["effective_to"] == b["effective_from"], user
            assert a["status"] != b["status"], user
        assert vs[-1]["effective_to"] is None


def test_scd2_versions_match_event_changepoints(spark):
    """Version count per user == number of event_type change points in
    the raw ordered event log."""
    from spark_hudi_etl_pipeline_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMALL, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    expected = {}
    for user, es in by_user.items():
        es.sort(key=lambda r: (r["ts"], r["event_id"]))
        n, prev = 0, None
        for e in es:
            if e["event_type"] != prev:
                n += 1
            prev = e["event_type"]
        expected[user] = n
    got = defaultdict(int)
    for r in QUERIES["scd2_user_status"](spark, SF_SMALL).collect():
        got[r["user_id"]] += 1
    assert dict(got) == expected


def test_quality_model_filter_threshold_consistent(spark):
    """keep is exactly score_q >= 2_500_000, scores are bounded by the
    weight budget, and every document is scored."""
    rows = QUERIES["quality_model_filter"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["keep"] == (r["score_q"] >= 2_500_000)
        # bias 2.0 + caps: +1.5 (bpe) + 3.0 (stop) max; -5.0 - 0.8 min
        assert -4_800_000 <= r["score_q"] <= 6_500_000


def test_doc_ngram_novelty_originals_high_copies_low(spark):
    """Near-copies (doc_id >= 10000, constructed from doc_id < 5) share
    almost all shingles with their originals → novelty ~0; their
    originals own their shingles → novelty 1e6. Bounds hold for all."""
    rows = {
        r["doc_id"]: r
        for r in QUERIES["doc_ngram_novelty"](spark, SF_SMALL).collect()
    }
    for doc_id, r in rows.items():
        assert 0 <= r["n_novel"] <= r["n_shingles"]
        assert 0 <= r["novelty_q"] <= 1_000_000
    for orig in range(5):
        if orig in rows and orig + 10000 in rows:
            assert rows[orig]["novelty_q"] == 1_000_000
            # the appended 3-word tail adds at most a handful of new
            # shingles — novelty stays far below the original's
            assert rows[orig + 10000]["novelty_q"] < 200_000


def test_bm25_ranking_invariants(spark):
    """Ranks are 1..20 without gaps, ordered by (score desc, doc_id);
    scores positive; docs matching more query terms never score zero."""
    rows = QUERIES["bm25_rank_docs"](spark, SF_SMALL).collect()
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    assert 0 < len(rows) <= 20
    for a, b in zip(rows, rows[1:]):
        assert (a["score_q"], -a["doc_id"]) >= (b["score_q"], -b["doc_id"])
    for r in rows:
        assert r["score_q"] > 0
        assert 1 <= r["n_terms"] <= 3


def test_quality_canonical_prefers_longest(spark):
    """The appended-tail near-copies are longer than their originals, so
    quality resolution keeps the copy and drops the original — the
    opposite keep-set of min-id resolution; singleton docs keep."""
    rows = {
        r["doc_id"]: r
        for r in QUERIES["dedup_canonical_by_quality"](spark, SF_SMALL).collect()
    }
    for orig in range(5):
        copy = orig + 10000
        assert rows[copy]["canonical_id"] == copy
        assert rows[copy]["keep"] is True
        assert rows[orig]["canonical_id"] == copy
        assert rows[orig]["keep"] is False
    # Per cluster: exactly one keeper, and it is the cluster's canonical;
    # the keeper maximizes (text length, -doc_id) over the cluster. The
    # fixture also contains NATURAL near-dup pairs (random-token texts),
    # so clusters beyond the injected ones are expected.
    from spark_hudi_etl_pipeline_spark.plans.dedup_plans import _with_near_dups

    lengths = {
        r["doc_id"]: len(r["text"])
        for r in _with_near_dups(spark, SF_SMALL).collect()
    }
    clusters = defaultdict(list)
    for r in rows.values():
        clusters[r["canonical_id"]].append(r)
    for canon, members in clusters.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1 and keepers[0]["doc_id"] == canon
        best = min(members, key=lambda m: (-lengths[m["doc_id"]], m["doc_id"]))
        assert best["doc_id"] == canon
