"""Round-12 widening: sessionized funnel attribution and Bloom-gated
decontamination — planted-evidence fixtures for the boundary cases each
docstring claims (acquisition touch strictly before the entry view;
same-instant purchase ties; map-side fast-clean vs exact-verified drop).
Cross-engine value parity is covered by the DuckDB oracles
(tools/oracle_check.py)."""

from __future__ import annotations

import datetime as dt

from spark_hudi_etl_pipeline_spark.plans.registry import QUERIES

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _t(day, hour=0, us=0):
    return dt.datetime(2024, 1, day, hour, 0, 0, us)


def _write(spark, path, table, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{table}.parquet")


# --------------------------------------------------------------------------
# funnel_attributed_conversions
# --------------------------------------------------------------------------


def test_funnel_attribution_channels(spark, tmp_path):
    """A: click before the entry view ⇒ channel 'click' (the funnel's
    own in-window click must NOT be the touch). B: only a signup
    precedes the view ⇒ 'signup'. C: organic ⇒ 'none'. D (no purchase)
    and E (purchase past the 7-day click window) never convert."""
    rows = [
        # user 1: signup d1, click d2 (acquisition), view d3,
        # click d4 (funnel stage), purchase d5 $10
        (1, _t(1), 1, "signup", 0.0, "{}"),
        (2, _t(2), 1, "click", 0.0, "{}"),
        (3, _t(3), 1, "view", 0.0, "{}"),
        (4, _t(4), 1, "click", 0.0, "{}"),
        (5, _t(5), 1, "purchase", 10.0, "{}"),
        # user 2: signup d1, view d2, click d3, purchase d4 $20
        (6, _t(1), 2, "signup", 0.0, "{}"),
        (7, _t(2), 2, "view", 0.0, "{}"),
        (8, _t(3), 2, "click", 0.0, "{}"),
        (9, _t(4), 2, "purchase", 20.0, "{}"),
        # user 3: organic view d1, click d2, purchase d3 $5
        (10, _t(1), 3, "view", 0.0, "{}"),
        (11, _t(2), 3, "click", 0.0, "{}"),
        (12, _t(3), 3, "purchase", 5.0, "{}"),
        # user 4: funnel never completes (no purchase)
        (13, _t(1), 4, "view", 0.0, "{}"),
        (14, _t(2), 4, "click", 0.0, "{}"),
        # user 5: purchase 17 days after the qualifying click — outside
        # the 7-day stage window, not a conversion
        (15, _t(1), 5, "click", 0.0, "{}"),
        (16, _t(2), 5, "view", 0.0, "{}"),
        (17, _t(3), 5, "click", 0.0, "{}"),
        (18, _t(20), 5, "purchase", 99.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = {
        r["channel"]: r
        for r in QUERIES["funnel_attributed_conversions"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {"click", "signup", "none"}
    assert got["click"]["n_conversions"] == 1
    assert got["click"]["revenue_cents"] == 1000
    assert got["click"]["ttc_sec_total"] == 2 * 86400  # view d3 → purchase d5
    assert got["signup"]["n_conversions"] == 1
    assert got["signup"]["revenue_cents"] == 2000
    assert got["none"]["n_conversions"] == 1
    assert got["none"]["revenue_cents"] == 500


def test_funnel_attribution_same_instant_purchases(spark, tmp_path):
    """Two purchases at the SAME microsecond: the qualifying purchase
    timestamp matches both rows, so revenue sums them (deterministic in
    both engines) while n_conversions stays 1."""
    rows = [
        (1, _t(1), 1, "view", 0.0, "{}"),
        (2, _t(2), 1, "click", 0.0, "{}"),
        (3, _t(3), 1, "purchase", 1.0, "{}"),
        (4, _t(3), 1, "purchase", 2.0, "{}"),  # same instant
    ]
    _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = QUERIES["funnel_attributed_conversions"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["channel"] == "none"
    assert r["n_conversions"] == 1
    assert r["revenue_cents"] == 300


# --------------------------------------------------------------------------
# decontaminate_bloom_gate
# --------------------------------------------------------------------------


def test_bloom_gate_fast_clean_vs_exact_drop(spark, tmp_path):
    """doc 0 (id%29==0) is the benchmark. doc 1 copies it verbatim —
    100% shared 8-grams, exact-verified drop. doc 2 shares nothing —
    zero suspected grams, cleared map-side (fast_clean). Benchmark docs
    are never counted in the corpus verdicts."""
    bench_text = " ".join(f"b{i}" for i in range(12))
    clean_text = " ".join(f"c{i}" for i in range(12))
    rows = [
        (0, bench_text, "en", "s", len(bench_text)),
        (1, bench_text, "en", "s", len(bench_text)),
        (2, clean_text, "en", "s", len(clean_text)),
    ]
    _write(spark, tmp_path, "documents", rows, DOCS_SCHEMA)
    got = QUERIES["decontaminate_bloom_gate"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["source"] == "s"
    assert r["n_docs"] == 2  # corpus only — the benchmark doc is excluded
    assert r["n_fast_clean"] == 1  # doc 2 never reached the exact join
    assert r["n_dropped"] == 1  # doc 1, exact-verified
    assert r["n_kept"] == 1


def test_bloom_gate_partial_overlap_below_threshold_kept(spark, tmp_path):
    """A doc sharing one 8-gram window out of many stays below the 20%
    contamination threshold: suspected (the gate flags it) but KEPT
    after exact verification — the gate changes cost, never the
    verdict."""
    bench_text = " ".join(f"b{i}" for i in range(8))  # exactly one 8-gram
    filler = " ".join(f"f{i}" for i in range(40))
    rows = [
        (0, bench_text, "en", "s", len(bench_text)),
        # 41 grams from filler+bench tail; only 1 exactly matches bench
        (1, filler + " " + bench_text, "en", "s", 0),
    ]
    _write(spark, tmp_path, "documents", rows, DOCS_SCHEMA)
    got = QUERIES["decontaminate_bloom_gate"](spark, str(tmp_path)).collect()
    r = got[0]
    assert r["n_docs"] == 1
    assert r["n_fast_clean"] == 0  # the shared gram trips the gate
    assert r["n_dropped"] == 0  # 1/41 < 20% — exact verify keeps it
    assert r["n_kept"] == 1


# --------------------------------------------------------------------------
# events_seasonal_anomaly
# --------------------------------------------------------------------------


def test_seasonal_anomaly_removes_weekly_pattern(spark, tmp_path):
    """Type A has a strong weekly pattern (Mondays 50, other days 10)
    and NO anomaly: the DOW profile absorbs it exactly (every residual
    0), so nothing is flagged — where a raw-count MAD gate would flag
    every Monday. Type B is flat except one 80-event spike day: the
    spike (and its dampened DOW cohort-mates, since a degenerate MAD=0
    gate flags every nonzero deviation) is flagged."""
    rows, eid = [], 0
    for day in range(1, 29):
        ts_day = dt.datetime(2024, 1, day)
        # Monday = weekday() 0
        n_a = 50 if ts_day.weekday() == 0 else 10
        n_b = 80 if day == 17 else 10
        for i in range(n_a):
            eid += 1
            rows.append((eid, ts_day + dt.timedelta(seconds=i), 1, "a", 0.0, "{}"))
        for i in range(n_b):
            eid += 1
            rows.append((eid, ts_day + dt.timedelta(seconds=i), 2, "b", 0.0, "{}"))
    _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = {
        r["event_type"]: r
        for r in QUERIES["events_seasonal_anomaly"](spark, str(tmp_path)).collect()
    }
    a, b = got["a"], got["b"]
    assert a["n_days"] == 28
    assert (a["med_resid"], a["mad"], a["n_anomalous_days"]) == (0.0, 0.0, 0)
    assert b["n_days"] == 28
    # spike day resid 53; its 3 Wednesday cohort-mates -17 each; MAD 0
    assert b["n_anomalous_days"] == 4


# --------------------------------------------------------------------------
# streaming_decontaminate_gate
# --------------------------------------------------------------------------


def test_streaming_gate_matches_batch(spark, tmp_path):
    """Micro-batch invariance: the streaming gate (maxFilesPerTrigger=1
    drain through foreachBatch) must produce exactly the batch query's
    per-source verdict rollup on the same fixture."""
    bench_text = " ".join(f"b{i}" for i in range(12))
    rows = [(0, bench_text, "en", "s0", 1)]
    for i in range(1, 9):
        src = f"s{i % 2}"
        text = bench_text if i <= 2 else " ".join(f"u{i}w{j}" for j in range(12))
        rows.append((i, text, "en", src, 1))
    _write(spark, tmp_path, "documents", rows, DOCS_SCHEMA)
    batch = sorted(
        tuple(r) for r in QUERIES["decontaminate_bloom_gate"](
            spark, str(tmp_path)
        ).collect()
    )
    stream = sorted(
        tuple(r) for r in QUERIES["streaming_decontaminate_gate"](
            spark, str(tmp_path)
        ).collect()
    )
    assert stream == batch
    assert any(r[4] > 0 for r in stream)  # the verbatim copies dropped
