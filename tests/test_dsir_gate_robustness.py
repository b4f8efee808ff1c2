"""Robustness audits for the DSIR oracle gates (advisor findings, r5).

Two failure modes could make the dsir_* CORRECTNESS rows lie or flake:

1. An xxhash64 collision between distinct bigram strings would merge
   their counts engine-side only (the oracle groups by the string), so
   the gate would fail with a confusing value diff. The fixtures are
   audited here the same way the other hashed-key sites are.
2. The compared fixed-point values floor a transcendental (``ln``):
   JVM ``Math.log`` and DuckDB's libm are each allowed ~1-ulp error, so
   a pre-floor value sitting essentially ON a quantization boundary
   could floor differently across platforms. The audit asserts every
   pre-floor value in the fixtures keeps a margin that is orders of
   magnitude above any cross-libm drift (~1e-10 at the 1e4 scale,
   ~1e-8 at the 1e6 Gumbel scale), so the gate is deterministic on any
   platform whose ``log`` is faithfully rounded.

Both audits run at sf0.001 and at sf0.01 (the driver-gate scale).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spark_hudi_etl_pipeline_spark.plans.training_plans import (
    _DSIR_BUCKETS,
    _DSIR_CTES,
    _DSIR_TARGET,
    _TOKS,
    _gram_starts,
    _tokens,
)
from spark_hudi_etl_pipeline_spark.sources.catalog import load_table

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_dsir_gram_codes_are_collision_free(spark, sf_dir):
    """#distinct bigram strings == #distinct xxhash64 codes, so the
    hashed engine-side grouping merges nothing the string-keyed oracle
    keeps apart."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _tokens().alias("t")
    )
    grams = d.select(
        F.explode(
            F.transform(
                _gram_starts(F.size("t"), 2),
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, 2)),
            )
        ).alias("g")
    )
    row = grams.agg(
        F.count_distinct("g").alias("n_grams"),
        F.count_distinct(F.xxhash64("g")).alias("n_codes"),
    ).first()
    assert row["n_grams"] == row["n_codes"], (
        f"xxhash64 collision among {row['n_grams']} bigrams at {sf_dir} — "
        "the dsir_importance_weights gate would diff confusingly"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_dsir_fixed_point_boundary_margins(sf_dir):
    """No pre-floor value in any dsir_* compared column sits near a
    quantization boundary (margins ≫ cross-libm 1-ulp drift)."""
    con = _duck(sf_dir)

    # Per-gram 1e4-scaled log-ratio (dsir_importance_weights /
    # dsir_resample_topk input). Drift bound ~1e-10; require 1e-8.
    (m_gram,) = con.execute(
        _DSIR_CTES
        + """
SELECT min(abs(x - round(x))) FROM (
  SELECT (ln((ct + 1.0) / (tot.nt + tot.v))
        - ln((cr + 1.0) / (tot.nr + tot.v))) * 10000 AS x
  FROM stats, tot)
"""
    ).fetchone()
    assert m_gram > 1e-8, f"gram log-ratio within {m_gram} of a floor boundary"

    # Per-doc 1e6-scaled Gumbel key (dsir_resample_topk). Drift ~1e-8;
    # require 1e-6.
    (m_key,) = con.execute(
        _DSIR_CTES
        + """
SELECT min(abs(x - round(x))) FROM (
  SELECT (weight_q / 10000.0
        - ln(-ln((CAST(('0x' || substring(md5('doc' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) + 0.5) / 4294967296.0))) * 1000000 AS x
  FROM w)
"""
    ).fetchone()
    assert m_key > 1e-6, f"Gumbel key within {m_key} of a floor boundary"

    # Per-bucket 1e4-scaled log-ratio (dsir_weights_hashed).
    tgt = ", ".join(f"'{s}'" for s in _DSIR_TARGET)
    (m_bucket,) = con.execute(
        f"""
WITH toks AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
bi AS (
  SELECT doc_id, source,
         unnest(list_transform(generate_series(1, len(t) - 1),
             i -> t[i] || ' ' || t[i + 1])) AS g
  FROM toks
),
bk AS (SELECT source,
              CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT)
                  % {_DSIR_BUCKETS} AS b
       FROM bi),
stats AS (
  SELECT b,
         CAST(sum(CASE WHEN source IN ({tgt}) THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(sum(CASE WHEN source IN ({tgt}) THEN 0 ELSE 1 END) AS BIGINT) AS cr
  FROM bk GROUP BY b
),
tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM stats)
SELECT min(abs(x - round(x))) FROM (
  SELECT (ln((ct + 1.0) / (tot.nt + {_DSIR_BUCKETS}))
        - ln((cr + 1.0) / (tot.nr + {_DSIR_BUCKETS}))) * 10000 AS x
  FROM stats, tot)
"""
    ).fetchone()
    assert m_bucket > 1e-8, f"bucket log-ratio within {m_bucket} of a boundary"
