"""Dump ``explain("formatted")`` (plus the simple plan, which carries
inline Exchange arguments) for named queries to ``plans/r13/<q>_<tag>.txt``.

Usage: python tools/explain_dump.py <tag> [sf_dir] <query> ...

The optimization-round deliverable: ``<q>_before.txt`` / ``<q>_after.txt``
pairs that let a reviewer check plan claims (Exchange counts, join
strategies, PushedFilters) without running Spark.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    tag = sys.argv[1]
    args = sys.argv[2:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args

    from spark_hudi_etl_pipeline_spark.plans import QUERIES
    from spark_hudi_etl_pipeline_spark.session import get_spark_session

    spark = get_spark_session("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = "/root/repo/plans/r13"
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
            print("\n=== simple (inline Exchange args) ===\n")
            df.explain()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
