"""Histogram-based strict-rank quantile binning.

The scale-safe replacement for a global ``ntile``/``rank`` over a big
relation: thresholds are found on the per-VALUE frequency histogram with
a TWO-LEVEL cumulative pass — a global ordered window over COARSE value
buckets (``floor(v / bucket_width)`` — bounded by the value range over
the bucket width, never by row count), then a per-bucket window over
only the ≤3 boundary buckets each quantile target lands in. A
near-unique high-cardinality metric (e.g. ``monetary_cents``) therefore
never funnels its whole histogram through one unpartitioned sort: the
global window sees ``range/width`` rows and the fine window partitions
by bucket (r11 advisor finding on the previous single-window version).

NULL metric values are excluded before binning (Spark's ASC window is
NULLS FIRST while DuckDB ranks NULLS LAST — a nullable metric would
silently diverge between engines otherwise; with every value NULL the
thresholds come back NULL). Callers bin aggregate-derived metrics that
are never NULL, so this is a guard, not a behavior change.

Equivalence to rank-based binning (used by the DuckDB oracles):
``v > t_k`` where ``t_k = min v with cum(v) >= K`` holds iff
``cnt_less(v) >= K`` iff ``rank(v) - 1 >= K`` — so
``1 + Σ_k [v > t_k]`` equals the strict-rank bin and ties share a bin.
The two-level cumulative count equals the single-window cumulative count
exactly (bucket order is consistent with value order), so thresholds are
bit-identical to the old formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Default coarse-bucket width: 2^20. Small-domain metrics (counts,
#: day ages) collapse into a handful of buckets — the fine window then
#: covers the whole (already tiny) histogram, same cost as before; wide
#: near-unique domains (cents amounts) split so no single window task
#: sees more than ~width distinct values.
DEFAULT_BUCKET_WIDTH = 1 << 20


def quartile_thresholds(
    df: DataFrame,
    metric: Column,
    name: str,
    *,
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
) -> DataFrame:
    """1-row frame (``{name}_t25``, ``{name}_t50``, ``{name}_t75``):
    t_k = min metric value whose cumulative frequency reaches
    ceil(k·n/4), NULL metric rows excluded. Intended for
    ``F.broadcast(...)`` + crossJoin."""
    hist = (
        df.filter(metric.isNotNull())
        .groupBy(metric.alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        # exact integer floor-division (v/width as a double would lose
        # precision past 2^53): v - pmod(v, w) is exactly divisible.
        .withColumn(
            "b",
            ((F.col("v") - F.pmod(F.col("v"), F.lit(bucket_width))) / bucket_width)
            .cast("long"),
        )
    )
    # Coarse pass: one ordered window over range/width bucket rows.
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    buckets = (
        hist.groupBy("b")
        .agg(F.sum("cnt").alias("bcnt"))
        .select(
            "b",
            "bcnt",
            F.coalesce(F.sum("bcnt").over(wb), F.lit(0)).alias("cum_before"),
            F.sum("bcnt").over(Window.partitionBy()).alias("n"),
        )
    )
    k25 = F.expr("(n + 3L) div 4L")
    k50 = F.expr("(n + 1L) div 2L")
    k75 = F.expr("(3L * n + 3L) div 4L")
    crosses = lambda k: (F.col("cum_before") < k) & (  # noqa: E731
        k <= F.col("cum_before") + F.col("bcnt")
    )
    bounds = buckets.filter(crosses(k25) | crosses(k50) | crosses(k75)).select(
        "b", "cum_before", "n"
    )
    # Fine pass: per-bucket window over ONLY the ≤3 boundary buckets.
    wv = (
        Window.partitionBy("b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fine = hist.join(F.broadcast(bounds), "b").select(
        "v",
        (F.col("cum_before") + F.sum("cnt").over(wv)).alias("cum"),
        "n",
    )
    return fine.agg(
        F.min(F.when(F.col("cum") >= k25, F.col("v"))).alias(f"{name}_t25"),
        F.min(F.when(F.col("cum") >= k50, F.col("v"))).alias(f"{name}_t50"),
        F.min(F.when(F.col("cum") >= k75, F.col("v"))).alias(f"{name}_t75"),
    )


def quartile_score(v: Column, name: str) -> Column:
    """Strict-rank quartile bin 1-4 against a joined
    ``quartile_thresholds`` frame (higher value ⇒ higher bin; ties
    share a bin)."""
    return (
        F.lit(1)
        + (v > F.col(f"{name}_t25")).cast("long")
        + (v > F.col(f"{name}_t50")).cast("long")
        + (v > F.col(f"{name}_t75")).cast("long")
    ).cast("long")
