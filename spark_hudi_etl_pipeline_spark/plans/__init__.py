"""Declarative query plans. Importing this package populates the global
query/oracle registry consumed by ``__spark_entry__.py``."""

from .registry import ORACLES, PRIORITY_WINDOW, QUERIES, ordered_queries, query

from . import analytics  # noqa: E402,F401  (registration side effects)
from . import analytics_ext  # noqa: E402,F401
from . import analytics_tpch_gaps  # noqa: E402,F401
from . import extract  # noqa: E402,F401
from . import pipeline_plans  # noqa: E402,F401
from . import dedup_plans  # noqa: E402,F401
from . import maintenance_plans  # noqa: E402,F401
from . import sampling_plans  # noqa: E402,F401
from . import similarity_plans  # noqa: E402,F401
from . import text_plans  # noqa: E402,F401
from . import training_plans  # noqa: E402,F401
from . import quality_plans  # noqa: E402,F401
from . import graph_plans  # noqa: E402,F401
from . import lifecycle_plans  # noqa: E402,F401
from . import bpe_plans  # noqa: E402,F401
from . import behavior_plans  # noqa: E402,F401
from . import variant_plans  # noqa: E402,F401

__all__ = ["ORACLES", "PRIORITY_WINDOW", "QUERIES", "ordered_queries", "query"]
