"""Deterministic dataset splitting and sampling for training-data
pipelines (north-star extension; BASELINE.json).

Random samplers (``df.sample``/``sampleBy``) are seed-reproducible only
within one Spark version and partitioning — useless as a contract when a
100 TB corpus is re-split months later on a different cluster. These
operators instead derive membership from a cryptographic hash of a stable
key column, so the assignment is a *pure function of the row*:

- identical across engines (the DuckDB oracles compute the same md5),
- stable under repartitioning, re-runs, and data append,
- parallelizable with zero coordination (no global sampling state).

The bucket is the first 4 hex chars of ``md5(key)`` compared against a
threshold string — lowercase fixed-width hex compares lexicographically
in numeric order, so ``substr(md5, 1, 4) < hex(frac * 16^4)`` keeps a
``frac`` share of keys (granularity 1/65536, plenty for split work).
Everything stays JVM-side built-in expressions (md5/substring/when) —
whole-stage codegen, no UDFs, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hex_threshold(fraction: float) -> str:
    """4-hex-digit threshold such that a uniform hash prefix is below it
    with probability ≈ ``fraction``. 'zzzz' sorts above every hex string
    (covers fraction >= 1); '0000' sorts below-or-equal all (fraction 0)."""
    if fraction >= 1.0:
        return "zzzz"
    n = max(0, int(fraction * 65536))  # truncate: 0.8 -> 0xcccc exactly
    return format(n, "04x")


def hash_bucket(key: Column) -> Column:
    """First 4 hex chars of md5 of the key rendered as a string — the
    engine-portable uniform bucket (matches DuckDB's md5 byte-for-byte)."""
    return F.substring(F.md5(key.cast("string")), 1, 4)


def hash_split(
    df: DataFrame,
    key: str,
    splits: dict[str, float],
    *,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (e.g. train/valid/test)
    by hash of ``key``. ``splits`` maps name -> fraction; fractions must
    sum to ~1 (the last split absorbs rounding remainder)."""
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = hash_bucket(F.col(key))
    names = list(splits)
    expr: Column | None = None
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        cond = bucket < hex_threshold(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(split_col, expr)


def hash_stratified_sample(
    df: DataFrame,
    key: str,
    strata: str,
    fractions: dict[str, float],
    *,
    default: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum fraction of rows, deterministically by hash of
    ``key`` (the reproducible form of ``sampleBy``): strata not listed in
    ``fractions`` fall back to ``default``. A pure filter — no shuffle,
    pushdown-friendly, and re-running on appended data never flips the
    membership of an already-sampled row."""
    bucket = hash_bucket(F.col(key))
    threshold: Column = F.lit(hex_threshold(default))
    for value, frac in fractions.items():
        threshold = (
            F.when(F.col(strata) == value, hex_threshold(frac)).otherwise(threshold)
        )
    return df.filter(bucket < threshold)


def weighted_pps_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    *,
    divisor: int,
    ipw_col: str = "ipw_q",
) -> DataFrame:
    """Deterministic Poisson probability-proportional-to-size sample:
    row included with p = min(1, weight / divisor), decided by PURE
    INTEGER comparison u16 · divisor < weight · 65536 (u16 = the row's
    16-bit md5 bucket) — no floats anywhere in the inclusion rule, so
    the sample is bit-identical on any engine, partitioning, or run
    (the mixture-sampling shape: documents drawn ∝ length/token count
    so the sample's TOKEN budget, not its row count, tracks the corpus).

    Included rows carry the inverse-probability weight
    ``ipw_col = floor(1e6 · max(1, divisor/weight))`` (fixed-point, the
    exact-integer Horvitz-Thompson correction a downstream aggregate
    multiplies by to stay unbiased).

    Scale: a codegen'd filter+project over existing columns — no
    shuffle, no state, no coordination; composes under any scan and
    preserves pushdown of neighboring predicates. Weights must be
    positive integers ≤ ~2^46 (the comparison stays inside int64).
    """
    if divisor < 1:
        raise ValueError("divisor must be >= 1")
    u16 = F.conv(hash_bucket(F.col(key_col)), 16, 10).cast("long")
    w = F.col(weight_col).cast("long")
    kept = df.filter(u16 * F.lit(int(divisor)) < w * F.lit(65536))
    return kept.withColumn(
        ipw_col,
        F.when(w >= divisor, F.lit(1_000_000))
        .otherwise(F.floor(F.lit(divisor * 1_000_000) / w))
        .cast("long"),
    )


def kfold_assign(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: ``fold`` =
    portable md5-60bit hash of the key, mod k. Map-only (no shuffle, no
    RNG state); the same key lands in the same fold on any cluster, any
    run, any engine — the DuckDB oracle recomputes folds bit-for-bit,
    and leakage-safety reduces to key identity (dedupe/canonicalize
    BEFORE folding, same contract as leakage_safe_split)."""
    from ..functions.text import portable_hash60

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.withColumn(
        "fold",
        F.pmod(portable_hash60(F.col(key_col).cast("string")), F.lit(k)),
    )
