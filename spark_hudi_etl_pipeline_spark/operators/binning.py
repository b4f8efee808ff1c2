"""Histogram-based strict-rank quantile binning.

The scale-safe replacement for a global ``ntile``/``rank`` over a big
relation: thresholds are found on the per-VALUE frequency histogram, so
the only ordered window runs over the value DOMAIN (bounded by the value
range, never the row count), and the tiny threshold frame broadcasts
back onto the rows.

Equivalence to rank-based binning (used by the DuckDB oracles):
``v > t_k`` where ``t_k = min v with cum(v) >= K`` holds iff
``cnt_less(v) >= K`` iff ``rank(v) - 1 >= K`` — so
``1 + Σ_k [v > t_k]`` equals the strict-rank bin and ties share a bin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quartile_thresholds(df: DataFrame, metric: Column, name: str) -> DataFrame:
    """1-row frame (``{name}_t25``, ``{name}_t50``, ``{name}_t75``):
    t_k = min metric value whose cumulative frequency reaches
    ceil(k·n/4). Intended for ``F.broadcast(...)`` + crossJoin."""
    hist = df.groupBy(metric.alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "v",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    return cum.agg(
        F.min(F.when(F.col("cum") >= F.expr("(n + 3L) div 4L"), F.col("v"))).alias(
            f"{name}_t25"
        ),
        F.min(F.when(F.col("cum") >= F.expr("(n + 1L) div 2L"), F.col("v"))).alias(
            f"{name}_t50"
        ),
        F.min(
            F.when(F.col("cum") >= F.expr("(3L * n + 3L) div 4L"), F.col("v"))
        ).alias(f"{name}_t75"),
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
