"""PySpark-native analytics engine with the capability surface of
``Srayoshi-Mirza/spark-hudi-etl-pipeline`` (reference at /root/reference,
read-only), re-expressed Spark-first.

Layout
------
- ``session``    — tuned SparkSession factory (reference R1/R12,
  pipeline_architecture.py:24-67, :423-448)
- ``sources``    — table catalog over parquet fixtures + writers/sinks
- ``functions``  — scalar/text/vector column functions (all JVM built-ins
  where possible; Arrow pandas UDFs only where unavoidable)
- ``operators``  — keyed upsert/precombine merge, dedup family,
  similarity search, latest-per-key / as-of
- ``plans``      — declarative query builders (analytics, incremental
  extract)
- ``streaming``  — Structured Streaming tier (watermarks, windows)
- ``pipeline``   — run orchestration: watermark, audit log, driver

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join strategy, and AQE handles runtime re-planning; designed to
run unchanged from local[32] to a 1000-executor cluster.
"""

__version__ = "0.1.0"
