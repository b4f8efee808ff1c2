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
