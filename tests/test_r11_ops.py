"""Round-11 behavioral-analytics + curation kernels: RFM quartile
segmentation, Markov transitions, day-of-week seasonal decomposition,
brand-basket association rules, cosine radius search, and token-budget
dataset selection — planted-evidence fixtures for the tie/boundary
cases each docstring claims the naive form gets wrong. Cross-engine
value parity is covered by the DuckDB oracles (tools/oracle_check.py)."""

from __future__ import annotations

import datetime as dt

from spark_hudi_etl_pipeline_spark.plans.registry import QUERIES

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _t(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _write(spark, path, table, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{table}.parquet")


# --------------------------------------------------------------------------
# rfm_customer_segments
# --------------------------------------------------------------------------


def test_rfm_quartiles_and_strict_rank_binning(spark, tmp_path):
    """Customer k (1..8) places k orders of $100k each, last on day k —
    all three metrics rank identically, so with n=8 the strict-rank
    thresholds (ceil 2/4/6) bin customers (1,2)->1, (3,4)->2,
    (5,6)->3, (7,8)->4 on every dimension."""
    rows, okey = [], 0
    for k in range(1, 9):
        for j in range(k):
            okey += 1
            rows.append((okey, k, "O", 100.0 * k, _t(k), "1-URGENT"))
    _write(spark, tmp_path, "orders", rows, ORDERS_SCHEMA)
    got = {
        r["o_custkey"]: r
        for r in QUERIES["rfm_customer_segments"](spark, str(tmp_path)).collect()
    }
    assert len(got) == 8
    for k in range(1, 9):
        r = got[k]
        expect = 1 + (k - 1 >= 2) + (k - 1 >= 4) + (k - 1 >= 6)
        assert r["recency_days"] == 8 - k
        assert r["frequency"] == k
        assert r["monetary_cents"] == k * k * 10_000
        assert (r["r_score"], r["f_score"], r["m_score"]) == (expect,) * 3, k


def test_rfm_ties_share_a_bin(spark, tmp_path):
    """4 customers with IDENTICAL frequency (and recency) all land in
    f_score=1/r_score=1 (cnt_less=0 for every tie), while their
    distinct spends still spread m_score 1..4."""
    rows = [(k, k, "O", 100.0 * k, _t(5), "1-URGENT") for k in range(1, 5)]
    _write(spark, tmp_path, "orders", rows, ORDERS_SCHEMA)
    got = {
        r["o_custkey"]: r
        for r in QUERIES["rfm_customer_segments"](spark, str(tmp_path)).collect()
    }
    assert [got[k]["f_score"] for k in range(1, 5)] == [1, 1, 1, 1]
    assert [got[k]["r_score"] for k in range(1, 5)] == [1, 1, 1, 1]
    assert [got[k]["m_score"] for k in range(1, 5)] == [1, 2, 3, 4]


# --------------------------------------------------------------------------
# event_transition_matrix
# --------------------------------------------------------------------------


def test_transition_counts_and_row_stochastic_probs(spark, tmp_path):
    """u1: A->B->A->C, u2: B->A — transitions (A,B)=1, (A,C)=1,
    (B,A)=2; each src row sums to probability 1."""
    rows = [
        (10, _t(1), 1, "A", 0.0, "{}"),
        (11, _t(2), 1, "B", 0.0, "{}"),
        (12, _t(3), 1, "A", 0.0, "{}"),
        (13, _t(4), 1, "C", 0.0, "{}"),
        (20, _t(1), 2, "B", 0.0, "{}"),
        (21, _t(2), 2, "A", 0.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = {
        (r["src_type"], r["dst_type"]): r
        for r in QUERIES["event_transition_matrix"](spark, str(tmp_path)).collect()
    }
    assert got[("A", "B")]["n_transitions"] == 1
    assert got[("A", "C")]["n_transitions"] == 1
    assert got[("B", "A")]["n_transitions"] == 2
    assert got[("A", "B")]["p_q"] == 0.5
    assert got[("A", "C")]["p_q"] == 0.5
    assert got[("B", "A")]["p_q"] == 1.0


def test_transition_equal_ts_tiebreaks_on_event_id(spark, tmp_path):
    """Two events at the SAME microsecond order by event_id, so the
    transition is X->Y (id 30 before 31), never Y->X."""
    rows = [
        (30, _t(1), 3, "X", 0.0, "{}"),
        (31, _t(1), 3, "Y", 0.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = QUERIES["event_transition_matrix"](spark, str(tmp_path)).collect()
    assert [(r["src_type"], r["dst_type"], r["n_transitions"]) for r in got] == [
        ("X", "Y", 1)
    ]


# --------------------------------------------------------------------------
# seasonal_dow_profile
# --------------------------------------------------------------------------


def test_seasonal_dow_mean_and_residuals(spark, tmp_path):
    """Two Mondays ($10, $20 → mean 1500¢) and one Tuesday; residuals
    are ±500 on the Mondays, 0 on the Tuesday; non-purchase events are
    excluded from revenue entirely. 2024-01-01 is a Monday (iso 1)."""
    rows = [
        (1, _t(1), 1, "purchase", 10.0, "{}"),
        (2, _t(8), 1, "purchase", 20.0, "{}"),
        (3, _t(2), 1, "purchase", 5.0, "{}"),
        (4, _t(1), 1, "click", 999.0, "{}"),  # ignored
    ]
    _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = {
        r["day"].isoformat(): r
        for r in QUERIES["seasonal_dow_profile"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {"2024-01-01", "2024-01-02", "2024-01-08"}
    m1, tu, m2 = got["2024-01-01"], got["2024-01-02"], got["2024-01-08"]
    assert (m1["iso_dow"], tu["iso_dow"], m2["iso_dow"]) == (1, 2, 1)
    assert (m1["total_cents"], m2["total_cents"]) == (1000, 2000)
    assert m1["dow_mean_cents"] == m2["dow_mean_cents"] == 1500
    assert (m1["resid_cents"], m2["resid_cents"]) == (-500, 500)
    assert (tu["dow_mean_cents"], tu["resid_cents"]) == (500, 0)


# --------------------------------------------------------------------------
# assoc_rules_brand_lift
# --------------------------------------------------------------------------

LINEITEM_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)
PART_SCHEMA = (
    "p_partkey long, p_name string, p_brand string, p_type string, "
    "p_size int, p_retailprice double"
)


def test_assoc_rules_min_support_and_lift(spark, tmp_path):
    """Customers 1-5 buy brands X and Y, customer 6 buys X only, and
    customers 1-4 also buy Z. Only (X,Y) clears min_support=5:
    support 5/6, confidence 5/6, lift 5·6/(6·5)=1.0; the n=4 pairs
    (X,Z)/(Y,Z) are filtered out."""
    parts = [
        (1, "px", "X", "t", 1, 1.0),
        (2, "py", "Y", "t", 1, 1.0),
        (3, "pz", "Z", "t", 1, 1.0),
    ]
    orders, lines, okey = [], [], 0
    for c in range(1, 7):
        basket = [1] if c == 6 else [1, 2]
        if c <= 4:
            basket.append(3)
        okey += 1
        orders.append((okey, c, "O", 1.0, _t(1), "1-URGENT"))
        for i, pk in enumerate(basket):
            lines.append(
                (okey, pk, 1, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _t(2))
            )
    _write(spark, tmp_path, "part", parts, PART_SCHEMA)
    _write(spark, tmp_path, "orders", orders, ORDERS_SCHEMA)
    _write(spark, tmp_path, "lineitem", lines, LINEITEM_SCHEMA)
    got = QUERIES["assoc_rules_brand_lift"](spark, str(tmp_path)).collect()
    assert [(r["brand_a"], r["brand_b"]) for r in got] == [("X", "Y")]
    r = got[0]
    assert (r["n_both"], r["n_a"], r["n_b"]) == (5, 6, 5)
    assert (r["support_q"], r["conf_q"], r["lift_q"]) == (0.8333, 0.8333, 1.0)


# --------------------------------------------------------------------------
# radius_search_cosine
# --------------------------------------------------------------------------


def test_radius_search_threshold_cut(spark, tmp_path):
    """Query vec 0 = e1: the identical corpus vector (cos 1.0) and the
    45-degree one (cos 0.7071) pass the 0.35 radius; the orthogonal
    (0.0) and antipodal (-1.0) do not. The self-match is retained."""
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),  # the query (vec_id < 20)
        (100, [2.0, 0.0, 0.0, 0.0], 1),  # parallel → cos 1.0
        (101, [0.0, 1.0, 0.0, 0.0], 1),  # orthogonal → 0.0
        (102, [1.0, 1.0, 0.0, 0.0], 1),  # 45° → 0.7071
        (103, [-1.0, 0.0, 0.0, 0.0], 1),  # antipodal → -1.0
    ]
    _write(spark, tmp_path, "embeddings", vecs, EMB_SCHEMA)
    got = QUERIES["radius_search_cosine"](spark, str(tmp_path)).collect()
    assert [(r["qid"], r["cid"], r["cosine"]) for r in got] == [
        (0, 0, 1.0),
        (0, 100, 1.0),
        (0, 102, 0.7071),
    ]


# --------------------------------------------------------------------------
# token_budget_selection
# --------------------------------------------------------------------------


def _doc(i, text):
    return (i, text, "en", "src", len(text))


def test_token_budget_greedy_by_quality(spark, tmp_path):
    """4 two-token docs, budget = 8//2 = 4 tokens: the two
    highest-alpha-ratio docs (1: 857‰, 3: 666‰) fit exactly; doc 2
    (571‰) would overflow and doc 4 (0‰) is never reached."""
    docs = [
        _doc(1, "aaa bbb"),  # 6/7 → 857
        _doc(2, "cc dd!!"),  # 4/7 → 571
        _doc(3, "e f"),  # 2/3 → 666
        _doc(4, "!!! ???"),  # 0/7 → 0
    ]
    _write(spark, tmp_path, "documents", docs, DOCS_SCHEMA)
    got = QUERIES["token_budget_selection"](spark, str(tmp_path)).collect()
    assert [(r["doc_id"], r["quality_pm"], r["n_tokens"]) for r in got] == [
        (1, 857, 2),
        (3, 666, 2),
    ]


def test_token_budget_boundary_bucket_splits_on_doc_id(spark, tmp_path):
    """Two docs with IDENTICAL quality (same text), 3 tokens each,
    budget 6//2 = 3: only the lower doc_id fits — the boundary bucket
    must order by doc_id, not take both or neither."""
    docs = [_doc(7, "aa bb cc"), _doc(8, "aa bb cc")]
    _write(spark, tmp_path, "documents", docs, DOCS_SCHEMA)
    got = QUERIES["token_budget_selection"](spark, str(tmp_path)).collect()
    assert [(r["doc_id"], r["n_tokens"]) for r in got] == [(7, 3)]


# --------------------------------------------------------------------------
# mmr_diversified_topk
# --------------------------------------------------------------------------


def test_mmr_prefers_diverse_over_near_duplicate(spark, tmp_path):
    """Plain relevance order is c100, c101 (exact duplicate of c100),
    c102 — MMR (λ=0.7) must demote the duplicate: sim(101,100)=1.0
    gives it score .63−.30=.33 while the 27°-apart c102 scores
    .56−.138=.422, so the diversified order is c100, c102, c101."""
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),  # query
        (100, [0.9, 0.43589, 0.0, 0.0], 1),  # rel .9 → pick 1
        (101, [0.9, 0.43589, 0.0, 0.0], 1),  # duplicate of c100
        (102, [0.8, -0.6, 0.0, 0.0], 1),  # rel .8, sim to c100 .4585
        (103, [0.5, 0.0, 0.866, 0.0], 1),  # rel .5 — never picked
    ]
    _write(spark, tmp_path, "embeddings", vecs, EMB_SCHEMA)
    got = QUERIES["mmr_diversified_topk"](spark, str(tmp_path)).collect()
    assert [(r["qid"], r["mmr_rank"], r["cid"]) for r in got] == [
        (0, 1, 100),
        (0, 2, 102),
        (0, 3, 101),
    ]


# --------------------------------------------------------------------------
# curriculum_difficulty_epochs
# --------------------------------------------------------------------------


def test_curriculum_stages_and_portable_shuffle_pos(spark, tmp_path):
    """Doc k has k tokens (k=1..8): stages bin (1,2)->1 … (7,8)->4 by
    the strict-rank quartile rule; shuffle_pos is the md5-60bit of
    'cur:<doc_id>', reproducible outside Spark."""
    import hashlib

    docs = [_doc(k, " ".join(["tok"] * k)) for k in range(1, 9)]
    _write(spark, tmp_path, "documents", docs, DOCS_SCHEMA)
    got = {
        r["doc_id"]: r
        for r in QUERIES["curriculum_difficulty_epochs"](spark, str(tmp_path)).collect()
    }
    for k in range(1, 9):
        assert got[k]["n_tokens"] == k
        assert got[k]["stage"] == 1 + (k - 1 >= 2) + (k - 1 >= 4) + (k - 1 >= 6)
        expect = int(hashlib.md5(f"cur:{k}".encode()).hexdigest()[:15], 16)
        assert got[k]["shuffle_pos"] == expect


def test_curriculum_ties_share_a_stage(spark, tmp_path):
    """Identical lengths all land in stage 1 (strict-rank ties)."""
    docs = [_doc(i, "a b c") for i in range(4)]
    _write(spark, tmp_path, "documents", docs, DOCS_SCHEMA)
    got = QUERIES["curriculum_difficulty_epochs"](spark, str(tmp_path)).collect()
    assert [r["stage"] for r in got] == [1, 1, 1, 1]


# --------------------------------------------------------------------------
# source_kl_divergence
# --------------------------------------------------------------------------


def test_kl_zero_for_single_source(spark, tmp_path):
    """With one source, P_source == P_corpus exactly — every term's
    ln ratio is 0, so the fixed-point KL is exactly 0."""
    docs = [
        (1, "x y x", "en", "only", 5),
        (2, "y x y", "en", "only", 5),
    ]
    _write(spark, tmp_path, "documents", docs, DOCS_SCHEMA)
    got = QUERIES["source_kl_divergence"](spark, str(tmp_path)).collect()
    assert [(r["source"], r["n_tokens_topv"], r["kl_q8"]) for r in got] == [
        ("only", 6, 0)
    ]


def test_kl_positive_for_skewed_source(spark, tmp_path):
    """Source b over-represents 'x' (3:1) vs the corpus (2:1): its KL
    must be positive and match the hand-computed fixed-point fold
    (±2 quanta for ln library slack); balanced source a diverges the
    other way and is also positive."""
    import math

    docs = [
        (1, "x y", "en", "a", 3),
        (2, "x x x y", "en", "b", 7),
    ]
    _write(spark, tmp_path, "documents", docs, DOCS_SCHEMA)
    got = {
        r["source"]: r
        for r in QUERIES["source_kl_divergence"](spark, str(tmp_path)).collect()
    }
    # corpus: x=4, y=2 of 6 → q = (2/3, 1/3)
    def kl(px, py):
        return sum(
            math.floor(p * math.log(p / q) * 1e8)
            for p, q in ((px, 4 / 6), (py, 2 / 6))
        )

    assert got["a"]["n_tokens_topv"] == 2
    assert got["b"]["n_tokens_topv"] == 4
    assert abs(got["a"]["kl_q8"] - kl(1 / 2, 1 / 2)) <= 2
    assert abs(got["b"]["kl_q8"] - kl(3 / 4, 1 / 4)) <= 2
    assert got["a"]["kl_q8"] > 0 and got["b"]["kl_q8"] > 0


def test_seasonal_negative_sums_floor_divide(spark, tmp_path):
    """Refund-heavy days: two Mondays totaling -501¢ must floor-divide
    to a -251¢ mean (DuckDB // semantics), not truncate to -250 — the
    (s - pmod(s, n)) div n form pins it for negative sums."""
    rows = [
        (1, _t(1), 1, "purchase", -3.00, "{}"),
        (2, _t(8), 1, "purchase", -2.01, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = {
        r["day"].isoformat(): r
        for r in QUERIES["seasonal_dow_profile"](spark, str(tmp_path)).collect()
    }
    assert got["2024-01-01"]["dow_mean_cents"] == -251
    assert got["2024-01-01"]["resid_cents"] == -300 - (-251)
    assert got["2024-01-08"]["resid_cents"] == -201 - (-251)


# --------------------------------------------------------------------------
# events_burst_islands
# --------------------------------------------------------------------------


def test_burst_islands_split_on_gap(spark, tmp_path):
    """Type 'a': 5 events/day for days 1-10, 20/day on days 11,12 and
    14 — median 5, threshold 10, so the qualifying days form TWO
    islands (11-12 and 14, split by the quiet day 13). Flat type 'b'
    never bursts."""
    rows, eid = [], 0
    for day in range(1, 15):
        n_a = 20 if day in (11, 12, 14) else (5 if day <= 10 else 0)
        for _ in range(n_a):
            eid += 1
            rows.append((eid, _t(day), 1, "a", 0.0, "{}"))
        for _ in range(5):
            eid += 1
            rows.append((eid, _t(day), 1, "b", 0.0, "{}"))
    _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = QUERIES["events_burst_islands"](spark, str(tmp_path)).collect()
    assert [
        (r["event_type"], r["start_day"].isoformat(), r["end_day"].isoformat(),
         r["n_days"], r["peak_daily"], r["total_events"])
        for r in got
    ] == [
        ("a", "2024-01-11", "2024-01-12", 2, 20, 40),
        ("a", "2024-01-14", "2024-01-14", 1, 20, 20),
    ]


# --------------------------------------------------------------------------
# graph_label_propagation
# --------------------------------------------------------------------------


def test_label_propagation_star_communities(spark, tmp_path):
    """Star: customer 1 (node 2) buys from suppliers 1,2,3 (nodes
    3,5,7). Round 1 ties on all three leaf labels -> min label 3 for
    the hub; after 3 synchronous rounds the leaves carry label 2 and
    the hub label 3 — communities (2: 3 nodes), (3: 1 node)."""
    orders = [(1, 1, "O", 1.0, _t(1), "1-URGENT")]
    lines = [
        (1, 10 + s, s, s, 1.0, 1.0, 0.0, 0.0, "N", "O", _t(2))
        for s in (1, 2, 3)
    ]
    parts = [(10 + s, f"p{s}", "B", "t", 1, 1.0) for s in (1, 2, 3)]
    _write(spark, tmp_path, "orders", orders, ORDERS_SCHEMA)
    _write(spark, tmp_path, "lineitem", lines, LINEITEM_SCHEMA)
    _write(spark, tmp_path, "part", parts, PART_SCHEMA)
    got = QUERIES["graph_label_propagation"](spark, str(tmp_path)).collect()
    assert [(r["community"], r["n_nodes"]) for r in got] == [(2, 3), (3, 1)]


# --------------------------------------------------------------------------
# dedup_containment_pairs
# --------------------------------------------------------------------------


def test_containment_catches_subset_jaccard_misses(spark, tmp_path):
    """doc 2 = doc 1 plus a tail: every shingle of doc 1 appears in
    doc 2, so containment(1 ⊂ 2) = 1.0 while Jaccard is only 0.5 —
    below the 0.8 gate a symmetric measure would need. The unrelated
    doc 3 pairs with nothing. (The query also injects tail-appended
    copies of doc_id < 5 as ids +10000 — those surface too.)"""
    docs = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "s", 36),
        (2, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 46),
        (3, "one two three four five six seven", "en", "s", 33),
    ]
    _write(spark, tmp_path, "documents", docs, DOCS_SCHEMA)
    got = {
        (r["id_a"], r["id_b"]): r
        for r in QUERIES["dedup_containment_pairs"](spark, str(tmp_path)).collect()
    }
    r = got[(1, 2)]
    assert r["cont_a_q"] == 1.0 and r["cont_b_q"] == 0.5
    # injected near-copies: originals fully contained in their copies
    assert all(
        got[(i, i + 10000)]["cont_a_q"] == 1.0 for i in (1, 2, 3) if (i, i + 10000) in got
    )
    assert (1, 3) not in got and (2, 3) not in got


# --------------------------------------------------------------------------
# quartile_thresholds plan-shape parity (r13: single-window fast path,
# driver-side coarse bounds, broadcast fallback)
# --------------------------------------------------------------------------


def test_quartile_thresholds_three_shapes_bit_identical(spark):
    """The same data routed through all three plan shapes — forced via
    bucket_width — must produce bit-identical thresholds: negatives,
    ties, and a NON-power-of-two width (the r12 advisor's exact-division
    hazard) included. 997-wide buckets over a ~200k range exercises the
    driver-bounds path; width 2 pushes past PLANNING_BUCKET_CAP into the
    broadcast fallback; a huge width takes the single-window route."""
    from pyspark.sql import functions as F

    from spark_hudi_etl_pipeline_spark.operators.binning import (
        PLANNING_BUCKET_CAP,
        quartile_thresholds,
    )

    vals = [(i * 7 - 100_000,) for i in range(30_000)] + [(-100_000,)] * 500
    df = spark.createDataFrame(vals, "m long")
    single = quartile_thresholds(
        df, F.col("m"), "x", bucket_width=1 << 40
    ).first()
    driver_bounds = quartile_thresholds(
        df, F.col("m"), "x", bucket_width=997
    ).first()
    assert (210_000 // 2) > PLANNING_BUCKET_CAP  # width 2 ⇒ fallback
    broadcast_fb = quartile_thresholds(df, F.col("m"), "x", bucket_width=2).first()
    assert tuple(single) == tuple(driver_bounds) == tuple(broadcast_fb)
    # cross-check against exact Python strict-rank thresholds
    xs = sorted(v for (v,) in vals)
    n = len(xs)
    expect = tuple(xs[k - 1] for k in ((n + 3) // 4, (n + 1) // 2, (3 * n + 3) // 4))
    assert tuple(single) == expect
