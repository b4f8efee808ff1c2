"""Single-session A/B probe runner (invoked by bench.py as a subprocess).

Usage: python tools/ab_probe.py <tree_dir> <sf_dir> <passes> <query> ...

Imports the engine FROM ``tree_dir`` (which may be a detached worktree of a
previous round's snapshot), runs each named query ``passes`` times against
``sf_dir`` through the noop sink, and prints ONE JSON line
``{"timings": {name: min_sec}, "passes": {name: [sec, ...]}}`` to stdout.

Rationale (BASELINE.md §conventions, r11 adjudication): this host swings
2-4x between quiet and contended windows, so cross-round suite walls are
only comparable when the previous snapshot and the current tree are run
INTERLEAVED on the same box. bench.py alternates sessions of this script
(prev, cur, prev, cur) and reports the per-query min ratio. Queries missing
from the target tree's registry (registered after that snapshot) are
silently skipped — the ratio is computed on the shared set.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree, sf_dir, passes_s = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    passes = int(passes_s)
    sys.path.insert(0, tree)
    os.chdir(tree)

    from pyspark.sql import functions as F

    from spark_hudi_etl_pipeline_spark.plans import QUERIES
    from spark_hudi_etl_pipeline_spark.session import get_spark_session

    spark = get_spark_session("spark-graft-ab-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # Same warmup shape as bench.py: JVM/codegen/parquet footers via a
    # real query, then the Python/Arrow worker pool.
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(0, 1024, 1, 32).select(_warm("id")).write.mode("overwrite").format(
        "noop"
    ).save()

    present = [n for n in names if n in QUERIES]
    per_pass: dict[str, list[float]] = {n: [] for n in present}
    for _ in range(passes):
        for n in present:
            t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
            per_pass[n].append(round(time.perf_counter() - t0, 3))

    print(
        json.dumps(
            {
                "timings": {n: min(v) for n, v in per_pass.items()},
                "passes": per_pass,
            }
        )
    )


if __name__ == "__main__":
    main()
