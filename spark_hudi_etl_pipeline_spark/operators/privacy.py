"""k-anonymity release (Samarati/Sweeney) — the governance operator
next to the GDPR erasure flow (``plans/lifecycle_plans.py::
gdpr_erase_subject``): before a table leaves the lakehouse, every row's
quasi-identifier combination must be shared by at least ``k`` released
rows, so no individual is re-identifiable by joining the release
against outside data.

Two-level generalization ladder, the standard suppress-or-coarsen
policy:

- level 0 — rows whose full-granularity quasi group reaches ``k`` are
  released as-is;
- level 1 — the failing rows coarsen the designated quasi columns (the
  generalization hierarchy, e.g. balance decile → quintile-of-deciles)
  and form NEW equivalence classes among themselves; classes reaching
  ``k`` are released at the coarse granularity;
- suppressed — rows still under ``k`` publish nothing (all published
  quasi columns null).

The level-1 count deliberately includes ONLY level-0 failures: released
data contains two strata (fine and coarse), and an attacker sees each
stratum separately — a coarse class padded with rows that were actually
released at full detail would fake its size.

Scale shape: two window passes, each one hash exchange on the quasi
columns (no join back, no collect); the quasi-group cardinality — not
the row count — bounds the state per task. Skewed quasi groups (one
giant (nation, segment) cell) are exactly the groups that trivially
pass ``k`` and carry no per-group state beyond a count, so the usual
hot-key mitigations are unnecessary here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def k_anonymize_two_level(
    df: DataFrame,
    quasi: list[str],
    k: int,
    coarsen: dict[str, Column],
) -> DataFrame:
    """Annotate ``df`` with the release decision. Adds:

    - ``released_level`` — 0 (full detail), 1 (coarsened), −1 (suppressed);
    - ``pub_<c>`` for each quasi column — the value the release may
      publish at that row's level (coarsened columns show the coarse
      value at level 1; everything null when suppressed);
    - ``group_n`` — the size of the row's released equivalence class
      (null when suppressed).

    ``coarsen`` maps a quasi column name to its level-1 generalization
    expression; unmapped quasi columns publish unchanged at level 1.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    missing = [c for c in coarsen if c not in quasi]
    if missing:
        raise ValueError(f"coarsen keys not in quasi columns: {missing}")

    w0 = Window.partitionBy(*[F.col(c) for c in quasi])
    d = df.withColumn("_n0", F.count(F.lit(1)).over(w0))
    for c in quasi:
        d = d.withColumn(f"_g_{c}", coarsen.get(c, F.col(c)))
    w1 = Window.partitionBy(*[F.col(f"_g_{c}") for c in quasi])
    d = d.withColumn(
        "_n1",
        F.count(F.when(F.col("_n0") < k, F.lit(1))).over(w1),
    )
    level = (
        F.when(F.col("_n0") >= k, F.lit(0))
        .when(F.col("_n1") >= k, F.lit(1))
        .otherwise(F.lit(-1))
    )
    d = d.withColumn("released_level", level)
    for c in quasi:
        d = d.withColumn(
            f"pub_{c}",
            F.when(F.col("released_level") == 0, F.col(c)).when(
                F.col("released_level") == 1, F.col(f"_g_{c}")
            ),
        )
    d = d.withColumn(
        "group_n",
        F.when(F.col("released_level") == 0, F.col("_n0")).when(
            F.col("released_level") == 1, F.col("_n1")
        ),
    )
    return d.drop("_n0", "_n1", *[f"_g_{c}" for c in quasi])


def t_closeness_gate(
    df: DataFrame,
    quasi: list[str],
    sensitive_bin: str,
    *,
    t_num: int,
    t_den: int,
) -> DataFrame:
    """Ordinal t-closeness (Li, Li, Venkatasubramanian 2007) — the
    skewness-attack check on top of l-diversity: a class can hold many
    DISTINCT sensitive values yet still leak if its distribution differs
    sharply from the table's (e.g. a class where 90% sit in the top
    balance bin). Each equivalence class releases only if the Earth
    Mover's Distance between its sensitive-bin distribution and the
    GLOBAL one is <= t = ``t_num/t_den``.

    For an ordered attribute, EMD = (1/(m-1)) Σᵢ |cum_p(i) − cum_q(i)|.
    With counts instead of probabilities, cum_p(i) − cum_q(i) =
    (N·cumcᵢ − n·cumgᵢ)/(n·N), so the gate is the PURE INTEGER rule

        t_den · Σᵢ |N·cumcᵢ − n·cumgᵢ|  <=  t_num · n · N · (m−1)

    — no floats anywhere, bit-identical on any engine (requires
    t_den·N·n·m < 2^63; the 1e6 fixed-point ``emd_q`` diagnostic
    tightens that to 1e6·N·n·(m−1) < 2^63, ample for release-table
    sizes).

    Returns one row per equivalence class: the quasi columns,
    ``class_n``, ``emd_num`` (the integer numerator), ``emd_q``
    (floor(EMD·1e6)), and ``released``.

    Scale shape: the data-scale cost is ONE groupBy to |classes|·m rows
    (plus the m-row global histogram); the cumulative windows run over
    the bin DOMAIN (m rows per class), and the global histogram is
    broadcast — nothing data-scale shuffles twice.
    """
    if t_num < 0 or t_den < 1:
        raise ValueError(f"need t_num >= 0 and t_den >= 1, got {t_num}/{t_den}")
    g = df.groupBy(sensitive_bin).agg(F.count(F.lit(1)).alias("_g"))
    wb = Window.orderBy(sensitive_bin).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # m-row relation: per-bin global cumulative count + table totals.
    bins = g.select(
        F.col(sensitive_bin).alias("_bin"),
        F.sum("_g").over(wb).alias("_cumg"),
        F.sum("_g").over(wall).alias("_N"),
        F.count(F.lit(1)).over(wall).alias("_m"),
    )
    cls = df.groupBy(*quasi, sensitive_bin).agg(F.count(F.lit(1)).alias("_c"))
    # Class sizes fold from the already-aggregated |classes|·m relation —
    # the raw table is scanned for exactly one groupBy (cls) plus the
    # m-row global histogram.
    classes = cls.groupBy(*quasi).agg(F.sum("_c").alias("class_n"))
    grid = classes.crossJoin(F.broadcast(bins))
    joined = grid.join(
        cls.withColumnRenamed(sensitive_bin, "_bin"), [*quasi, "_bin"], "left"
    ).withColumn("_c", F.coalesce(F.col("_c"), F.lit(0)))
    wc = (
        Window.partitionBy(*[F.col(c) for c in quasi])
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    diffs = joined.withColumn("_cumc", F.sum("_c").over(wc)).withColumn(
        "_diff",
        F.abs(F.col("_N") * F.col("_cumc") - F.col("class_n") * F.col("_cumg")),
    )
    per_class = diffs.groupBy(*quasi, "class_n").agg(
        F.sum("_diff").alias("emd_num"),
        F.max("_N").alias("_N"),
        F.max("_m").alias("_m"),
    )
    denom = F.col("class_n") * F.col("_N") * (F.col("_m") - 1)
    return per_class.select(
        *quasi,
        "class_n",
        "emd_num",
        F.expr("emd_num * 1000000").alias("_num6"),
        denom.alias("_den"),
    ).select(
        *quasi,
        "class_n",
        "emd_num",
        F.expr("_num6 div _den").alias("emd_q"),
        (
            F.col("emd_num") * F.lit(int(t_den))
            <= F.lit(int(t_num)) * F.col("_den")
        )
        .cast("int")
        .alias("released"),
    )


def l_diversity_gate(
    df: DataFrame, quasi: list[str], sensitive: str, l: int
) -> DataFrame:
    """Distinct l-diversity (Machanavajjhala et al.) — the release gate
    k-anonymity alone cannot provide: a class of k rows that all share
    ONE sensitive value still discloses it (homogeneity attack), so each
    quasi-identifier class must also contain at least ``l`` DISTINCT
    sensitive values to release.

    Adds ``class_n`` (equivalence-class size), ``distinct_sensitive``
    (distinct sensitive values in the class), and ``released`` (1 iff
    ``distinct_sensitive >= l``).

    Scale shape: one window pass = one hash exchange on the quasi
    columns; per-task state is the class's distinct sensitive-value set,
    bounded by the sensitive domain (not the row count) — classes big
    enough to be hot are exactly the ones whose sets saturate the domain
    early."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    w = Window.partitionBy(*[F.col(c) for c in quasi])
    d = (
        df.withColumn("class_n", F.count(F.lit(1)).over(w))
        .withColumn(
            "distinct_sensitive",
            F.size(F.collect_set(F.col(sensitive)).over(w)),
        )
    )
    return d.withColumn(
        "released", (F.col("distinct_sensitive") >= l).cast("int")
    )
