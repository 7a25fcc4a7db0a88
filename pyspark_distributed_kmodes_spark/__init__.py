"""pyspark_distributed_kmodes_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first engine with the capabilities of the
reference (`ThinkBigAnalytics/pyspark-distributed-kmodes`, an RDD-based
distributed ensemble k-modes library — see SURVEY.md §1-§2 Part A,
reconstructed) plus the full relational / streaming-shaped / LLM-data-
pipeline operator surface of SURVEY.md §2 Part B.

Design principles (SURVEY.md §4, §7):
- DataFrame / Spark SQL only; Catalyst + AQE do the physical planning.
- No RDD API anywhere; the reference's per-partition RDD loops
  (pyspark_kmodes.py:~120-220, reconstructed) are re-expressed as
  broadcast joins + groupBy aggregations, or `applyInPandas` where a
  genuinely local iterative step is required.
- Built-in JVM functions on the hot path; Arrow-batched pandas UDFs only
  where built-ins cannot express the semantics (vector top-k, multimodal
  decode).
- Every operator designed for a 1000-executor / 100 TB deployment even
  though tests run on local[32]: broadcast the small side, shuffle on
  high-cardinality keys only, pre-aggregate before shuffles, never
  collect() large data to the driver.
"""

from pyspark_distributed_kmodes_spark.registry import REGISTRY, query  # noqa: F401

__version__ = "0.1.0"
