"""Similarity search over embedding columns (north-star extension).

Two tiers, per the build plan (SURVEY.md §7 Phase 4):

- :func:`topk_cosine` — exact brute-force top-k: broadcast the query
  set against the corpus, per-partition top-k via window/TakeOrdered.
  The correctness baseline, and genuinely the right plan whenever
  |queries| is small: one corpus scan, no shuffle of the corpus, cost
  |corpus|·|queries|·d map-side.
- :func:`rp_lsh_ann` — approximate NN with seeded random-hyperplane
  (sign) LSH: corpus is bucketed by sketch bits; queries probe their own
  bucket (+ multi-probe neighbors at hamming distance 1), exact cosine
  re-rank inside the probed buckets. At 100 TB the bucketed corpus is
  written partitioned by sketch prefix, so a probe prunes to a few
  partitions — an IVF-style index expressed as plain partition pruning.

Vector math is Catalyst higher-order functions (functions/vectors.py) —
JVM-side, codegen'd, no UDF in either path.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str,
    query_id: str,
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (query_id, corpus_id, cosine, rank) — rank 1..k, ties broken
    by corpus id for determinism.
    """
    q = F.broadcast(
        queries.select(F.col(query_id).alias("qid"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(corpus_id).alias("cid"), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(q).select(
        "qid", "cid", F.round(vectors.cosine("cv", "qv"), 4).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("qid", "rank")
    )


# --------------------------------------------------------------------------
# Random-hyperplane LSH ANN
# --------------------------------------------------------------------------


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def rp_sketch(vec_col, dim: int, n_bits: int = 8, seed: int = 42):
    """Column expr: sign-LSH sketch — an int in [0, 2^n_bits) whose bit i
    is sign(v · r_i) for seeded Gaussian hyperplane r_i. Deterministic
    (fixed seed) so corpus and queries sketch identically."""
    planes = _hyperplanes(dim, n_bits, seed)
    sketch = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        d = vectors.dot(vec_col, lit_plane)
        sketch = sketch + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sketch


def rp_lsh_ann(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str,
    query_id: str,
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    k: int = 10,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: compare each query only against corpus vectors
    whose LSH sketch matches one of the query's probe sketches (own
    bucket + all hamming-1 neighbors when ``multiprobe``).

    Plan shape: corpus sketching is map-only; the join key is the sketch
    (2^n_bits distinct values), so the probe is a bucket join touching
    ~(1+n_bits)/2^n_bits of the corpus per query instead of all of it;
    exact cosine + window re-rank inside the candidates.
    """
    c = corpus.select(
        F.col(corpus_id).alias("cid"),
        F.col(vec_col).alias("cv"),
        rp_sketch(F.col(vec_col), dim, n_bits).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(vec_col).alias("qv"),
        rp_sketch(F.col(vec_col), dim, n_bits).alias("qsketch"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qsketch"),
            *[F.col("qsketch").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)],
        )
    else:
        probes = F.array(F.col("qsketch"))
    q_probe = F.broadcast(
        q.select("qid", "qv", F.explode(probes).alias("bucket"))
    )
    scored = c.join(q_probe, on="bucket").select(
        "qid", "cid", F.round(vectors.cosine("cv", "qv"), 4).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("qid", "rank")
    )
