"""Query/oracle registry.

Every operator from SURVEY.md §2 (plus the north-star extensions) is
declared as a named query: a ``(spark, sf_dir) -> DataFrame`` callable
plus, where SQL-expressible, a DuckDB oracle SQL string over the same
parquet tables. ``__spark_entry__.py`` exposes these to the driver's
correctness gate.

Contract (BASELINE.md): every computed column aliased identically in the
Spark plan and the oracle SQL; nondeterministic columns never hashed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` ⇒ rows-only check (for
    genuinely non-SQL-expressible operators)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
