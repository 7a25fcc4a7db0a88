"""Vector similarity search over the `embeddings` table.

Two execution paths, as a 100 TB engine needs both:

- **Exact brute-force top-k** (q60): Arrow-batched pandas UDF doing a
  blocked matrix multiply against the reference side streamed through
  ≤100k-row broadcast blocks (`_collect_ref_blocks`) — the driver
  never materializes more than one block, the query side streams
  through `mapInPandas`, and per-block partial top-ks merge in one
  window. Exact all-pairs compute is inherently quadratic; this path
  is the correctness baseline and the bounded-memory exact scheme.
- **LSH-bucketed ANN** (q61): random-hyperplane signatures computed with
  JVM built-ins, candidates meet only within a bucket (sub-quadratic),
  exact re-rank inside the bucket. Rows-only oracle (approximate);
  recall is property-tested against q60 in tests/test_vectors.py.

A pure-JVM dot product via zip_with/aggregate exists in
functions/vector_math.py and is used for the re-rank step — keeping the
candidate scoring inside codegen.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_distributed_kmodes_spark.functions.vector_math import cosine_sim
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
    ]
)


def _collect_ref_blocks(emb: DataFrame, max_block_rows: int):
    """Yield (ids, normalized matrix) numpy blocks of the reference side,
    never holding more than max_block_rows on the driver at once.

    Block membership is a deterministic key-mod over vec_id; block count
    comes from one cheap COUNT aggregate (id column only). Driver peak
    memory is ONE block regardless of corpus size — the scale guard that
    replaces the previous whole-table collect."""
    n_ref = emb.select("vec_id").count()
    n_blocks = max(1, -(-n_ref // max_block_rows))  # ceil
    for b in range(n_blocks):
        rows = (
            emb.select("vec_id", "embedding")
            .filter(F.pmod(F.col("vec_id"), F.lit(n_blocks)) == b)
            .collect()
        )
        if not rows:
            continue
        ids = np.array([r.vec_id for r in rows], dtype=np.int64)
        mat = np.array([r.embedding for r in rows], dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        yield ids, mat


def exact_topk(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 5,
    block: int = 2048,
    max_block_rows: int = 100_000,
) -> DataFrame:
    """Exact cosine top-k of every vector against the whole table.

    Block-partitioned exact scheme: the reference side is split into
    broadcastable blocks of ≤ max_block_rows; each block is broadcast in
    turn, every Arrow batch of query rows does a float64 blocked GEMM
    against it and emits a TIE-COMPLETE per-block candidate set (every
    neighbor whose rounded sim >= the in-block kth value — an
    argpartition prefix would drop tied neighbors with smaller ids and
    diverge from the oracle's `ORDER BY sim DESC, neighbor_id ASC`).
    The per-block partial top-ks union and one window re-ranks. No
    single driver materialization of the corpus; memory per task ≈
    block × block_rows × 8 bytes. At 100 TB q61's LSH path replaces the
    quadratic compute; this stays the exactness baseline.
    """
    from pyspark.sql import Window

    from pyspark_distributed_kmodes_spark.sources.tables import spread

    queries_df = spread(emb.select("vec_id", "embedding"), "vec_id")
    partials = []
    for ids_np, mat_np in _collect_ref_blocks(emb, max_block_rows):
        b_ids = spark.sparkContext.broadcast(ids_np)
        b_mat = spark.sparkContext.broadcast(mat_np)

        def score(batches: Iterator[pd.DataFrame], b_ids=b_ids, b_mat=b_mat) -> Iterator[pd.DataFrame]:
            ids, mat = b_ids.value, b_mat.value
            kth = min(k, len(ids)) - 1
            for pdf in batches:
                q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                q = np.array(list(pdf["embedding"]), dtype=np.float64)
                q /= np.linalg.norm(q, axis=1, keepdims=True)
                for s in range(0, len(q), block):
                    qb, qid = q[s : s + block], q_ids[s : s + block]
                    sims = qb @ mat.T  # (b, n_block) float64 GEMM
                    # self-match excluded by id, not by sim==1 (duplicates!)
                    self_mask = qid[:, None] == ids[None, :]
                    sims[self_mask] = -np.inf
                    # round BEFORE ranking so rank ties are broken identically
                    # to the SQL oracle (rounded sim desc, neighbor id asc)
                    sims = np.round(sims, 6)
                    # tie-complete candidates: everything >= the kth value
                    thresh = -np.partition(-sims, kth, axis=1)[:, kth : kth + 1]
                    ii, jj = np.nonzero((sims >= thresh) & ~self_mask)
                    yield pd.DataFrame(
                        {"vec_id": qid[ii], "neighbor_id": ids[jj], "cos_sim": sims[ii, jj]}
                    )

        partials.append(queries_df.mapInPandas(score, "vec_id bigint, neighbor_id bigint, cos_sim double"))

    cand = partials[0]
    for p in partials[1:]:
        cand = cand.unionByName(p)
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos_sim", "rank")
    )


@query(
    "qo60_cosine_topk",
    oracle="""
WITH sims AS (
  SELECT a.vec_id,
         b.vec_id AS neighbor_id,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
  FROM embeddings a
  JOIN embeddings b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT vec_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM sims
)
SELECT vec_id, neighbor_id, cos_sim, rank
FROM ranked WHERE rank <= 5
ORDER BY vec_id, rank
""",
    tags=("vector",),
    bench=True,
)
def qo60_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for every embedding (see exact_topk)."""
    emb = table(spark, sf_dir, "embeddings")
    return exact_topk(spark, emb, k=5).orderBy("vec_id", "rank")


@query(
    "qo61_ann_lsh",
    oracle=None,  # approximate: rows-only check; recall property-tested
    tags=("vector", "approx"),
)
def qo61_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: L=8 tables × 5 bits (see tuning
    note below).

    Signatures come from one Arrow-batched pandas UDF (a 64×48 GEMM per
    batch — trying to express the 8×5×64 hyperplane dot products as literal
    column expressions blows up codegen); bucketing, the candidate join,
    and the exact cosine re-rank (zip_with/aggregate) stay JVM-side.
    Sub-quadratic: candidates meet only inside a (table, bucket) pair.

    Deterministic: hyperplanes are np.default_rng(seed)-derived constants
    — identical on every executor, run, and cluster size.
    """
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # b/L tuned for this corpus's LOW neighbor similarity (~0.36 top-1 —
    # random vectors, LSH's worst case): p_bit≈0.62 ⇒ recall ≈
    # 1-(1-0.62^5)^8 ≈ 0.53. Real embedding corpora (top-1 sim ≥0.8)
    # support 12-16 bits per table and far fewer candidates.
    n_tables, bits, dim, seed = 8, 5, 64, 1013

    @F.pandas_udf("array<bigint>")
    def buckets_udf(emb_s: pd.Series) -> pd.Series:
        mat = np.array(list(emb_s), dtype=np.float64)
        keys = []
        for t in range(n_tables):
            h = np.random.default_rng(seed + t).standard_normal((bits, dim))
            bit = (mat @ h.T) >= 0
            keys.append((bit * (1 << np.arange(bits))).sum(axis=1).astype(np.int64) | (t << 32))
        return pd.Series(list(np.stack(keys, axis=1)))

    bucketed = emb.select("vec_id", "embedding", F.explode(buckets_udf("embedding")).alias("bucket"))

    a = bucketed.select(F.col("vec_id"), F.col("embedding").alias("ea"), "bucket")
    b = bucketed.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("eb"), "bucket")
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        a.join(b, ["bucket"])
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", "ea", "eb")
        .distinct()  # a pair may share several tables' buckets
        .select("vec_id", "neighbor_id", F.round(cosine_sim(F.col("ea"), F.col("eb")), 6).alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .orderBy("vec_id", "rank")
    )


def embedding_neardup_pairs(spark: SparkSession, emb: DataFrame, threshold: float = 0.85) -> DataFrame:
    """Exact embedding near-duplicate pairs (cos >= threshold) via the
    block-partitioned GEMM path — see q62 docstring."""
    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    partials = []
    for ids_np, mat_np in _collect_ref_blocks(emb, max_block_rows=100_000):
        b_ids = spark.sparkContext.broadcast(ids_np)
        b_mat = spark.sparkContext.broadcast(mat_np)

        def find_pairs(batches: Iterator[pd.DataFrame], b_ids=b_ids, b_mat=b_mat) -> Iterator[pd.DataFrame]:
            rids, rmat = b_ids.value, b_mat.value
            for pdf in batches:
                q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                q = np.array(list(pdf["embedding"]), dtype=np.float64)
                q /= np.linalg.norm(q, axis=1, keepdims=True)
                for s in range(0, len(q), 2048):
                    qb, qid = q[s : s + 2048], q_ids[s : s + 2048]
                    sims = qb @ rmat.T
                    ii, jj = np.nonzero((sims >= threshold) & (qid[:, None] < rids[None, :]))
                    yield pd.DataFrame(
                        {
                            "vec_a": qid[ii],
                            "vec_b": rids[jj],
                            "cos_sim": np.round(sims[ii, jj], 6),
                        }
                    )

        partials.append(emb.select("vec_id", "embedding").mapInPandas(find_pairs, out_schema))

    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    return out


@query(
    "qo62_embedding_neardup",
    oracle="""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.85
ORDER BY vec_a, vec_b
""",
    tags=("vector", "dedup"),
)
def qo62_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ 0.85), exact form.

    Same block-partitioned GEMM path as q60: the reference side streams
    through broadcastable blocks (driver holds ≤ max_block_rows at a
    time — never the corpus), the query side streams through
    mapInPandas, each block emits its threshold-passing pairs and the
    per-block outputs union. At 100 TB the LSH bucketing of q61
    pre-filters candidates instead of scoring the full matrix.
    """
    emb = table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(spark, emb, threshold=0.85).orderBy("vec_a", "vec_b")


@query(
    "qo67_embedding_stats",
    oracle="""
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(CAST(round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6)
                AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_norm,
       CAST(SUM(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_e0,
       CAST(MIN(CAST(embedding[1] AS DOUBLE)) AS DOUBLE) AS min_e0,
       CAST(MAX(CAST(embedding[1] AS DOUBLE)) AS DOUBLE) AS max_e0
FROM embeddings
GROUP BY label
ORDER BY label
""",
    tags=("vector", "agg"),
)
def qo67_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector statistics: counts, mean L2 norm (JVM
    higher-order fold — sequential, so bit-identical to the oracle's
    list_sum), mean/min/max of the first component.

    Observed: this corpus's embeddings are pre-normalized (norm≈1.0);
    the operator still guards against un-normalized future data.
    """
    from pyspark_distributed_kmodes_spark.functions.deterministic import davg
    from pyspark_distributed_kmodes_spark.functions.vector_math import norm

    emb = table(spark, sf_dir, "embeddings")
    e0 = F.element_at("embedding", 1).cast("double")
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            davg(F.round(norm(F.col("embedding")), 6)).alias("avg_norm"),
            davg(e0).alias("avg_e0"),
            F.min(e0).alias("min_e0"),
            F.max(e0).alias("max_e0"),
        )
        .orderBy("label")
    )


def _ivf_centroids(mat: np.ndarray, n_lists: int, seed: int = 7, iters: int = 5) -> np.ndarray:
    """Tiny spherical k-means coarse quantizer (driver-side numpy — the
    training sample at 100 TB is a bounded takeSample, not the corpus)."""
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), size=n_lists, replace=False)]
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    for _ in range(iters):
        assign = (mat @ cents.T).argmax(axis=1)
        for c in range(n_lists):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


@query("qo68_ann_ivf", oracle=None, tags=("vector", "approx"))
def qo68_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF (inverted-file) index: coarse k-means centroids → each
    vector posted to its nearest list → queries probe the `nprobe`
    nearest lists → exact re-rank inside the probed lists.

    Distribution shape: centroids are a small broadcast matrix; list
    assignment and probe assignment are Arrow-batched GEMMs; the
    candidate join is a JVM equi-join on list id. Cost ~ nprobe/n_lists
    of brute force. Deterministic (seeded centroids).
    """
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_lists, nprobe = 16, 4

    sample = emb.orderBy(F.xxhash64("vec_id", F.lit(7))).limit(4096).collect()
    mat = np.array([r.embedding for r in sample], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    cents = _ivf_centroids(mat, n_lists)
    b_cents = spark.sparkContext.broadcast(cents)

    @F.pandas_udf("int")
    def list_of(emb_s: pd.Series) -> pd.Series:
        m = np.array(list(emb_s), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        return pd.Series((m @ b_cents.value.T).argmax(axis=1).astype("int32"))

    @F.pandas_udf("array<int>")
    def probes_of(emb_s: pd.Series) -> pd.Series:
        m = np.array(list(emb_s), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        top = np.argsort(-(m @ b_cents.value.T), axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(top))

    posted = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("eb"), list_of("embedding").alias("list_id"))
    queries_df = emb.select("vec_id", F.col("embedding").alias("ea"), F.explode(probes_of("embedding")).alias("list_id"))
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        queries_df.join(posted, ["list_id"])
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", F.round(cosine_sim(F.col("ea"), F.col("eb")), 6).alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .orderBy("vec_id", "rank")
    )


@query(
    "qb20_embedding_vs_text_dedup",
    oracle="""
WITH pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
  FROM embeddings a
  JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.30
)
SELECT p.vec_a, p.vec_b, p.cos_sim,
       CASE WHEN da.text = db.text THEN 1 ELSE 0 END AS same_text,
       CASE WHEN md5(da.text) = md5(db.text) THEN 1 ELSE 0 END AS same_hash
FROM pairs p
JOIN documents da ON da.doc_id = p.vec_a
JOIN documents db ON db.doc_id = p.vec_b
ORDER BY vec_a, vec_b
""",
    tags=("vector", "dedup", "multimodal"),
)
def qb20_embedding_vs_text_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup audit: embedding near-duplicate pairs (cosine
    ≥ 0.30 — this synthetic corpus's similarity ceiling is ~0.4; real
    embedding corpora use ~0.85 — via q62's blocked exact path) joined
    against the text modality
    — does semantic similarity agree with byte/hash equality? The
    precision-audit query run before trusting embedding dedup at scale.

    Scale: the pair list is small (near-dups only); both document
    joins hit it with the corpus on the build side streamed — at 100 TB
    the pair side broadcasts instead (pairs ≪ corpus).
    """
    emb = table(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(spark, emb, threshold=0.30)
    d = table(spark, sf_dir, "documents").select("doc_id", "text", F.md5("text").alias("h"))
    da = d.select(F.col("doc_id").alias("vec_a"), F.col("text").alias("ta"), F.col("h").alias("ha"))
    db = d.select(F.col("doc_id").alias("vec_b"), F.col("text").alias("tb"), F.col("h").alias("hb"))
    return (
        pairs.join(da, "vec_a")
        .join(db, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            "cos_sim",
            F.when(F.col("ta") == F.col("tb"), 1).otherwise(0).alias("same_text"),
            F.when(F.col("ha") == F.col("hb"), 1).otherwise(0).alias("same_hash"),
        )
        .orderBy("vec_a", "vec_b")
    )


@query(
    "qb28_semantic_dedup",
    oracle="""
WITH RECURSIVE
edges AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.85
), sym AS (
  SELECT va AS a, vb AS b FROM edges UNION SELECT vb, va FROM edges
), reach(v, r) AS (
  SELECT a, a FROM sym
  UNION
  SELECT sym.a, reach.r FROM sym JOIN reach ON sym.b = reach.v
), cc AS (
  SELECT v, MIN(r) AS component FROM reach GROUP BY v
)
SELECT e.vec_id,
       COALESCE(cc.component, e.vec_id) AS component,
       CAST(COUNT(*) OVER (PARTITION BY COALESCE(cc.component, e.vec_id)) AS BIGINT)
         AS component_size,
       (e.vec_id = MIN(e.vec_id) OVER (PARTITION BY COALESCE(cc.component, e.vec_id)))
         AS keep
FROM embeddings e LEFT JOIN cc ON cc.v = e.vec_id
ORDER BY vec_id
""",
    tags=("vector", "dedup", "graph"),
)
def qb28_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication, end to end: exact cosine
    near-dup pairs (>= 0.85) -> connected components -> one canonical
    vector (min vec_id) kept per semantic cluster, singletons kept as
    their own cluster. The embedding-space twin of a98's text dedup:
    pairs are not groups, so transitive closure decides what "one copy"
    means before anything is dropped.

    Scale shape: pair generation is the block-partitioned GEMM of q62
    (driver holds <= one block, never the corpus; at 100 TB the q61 LSH
    buckets pre-filter candidates instead). CC runs on the tiny pair
    list (driver union-find under the bounded limit, pointer-doubling
    loop beyond it). The corpus-sized stage is ONE broadcast join of
    labels back to vec_ids plus one window — same single-shuffle
    discipline as a98.
    """
    from pyspark.sql import Window as W

    from pyspark_distributed_kmodes_spark.functions.graph import connected_components

    emb = table(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(spark, emb, threshold=0.85).select("vec_a", "vec_b")
    cc = connected_components(pairs, "vec_a", "vec_b").select(
        F.col("vertex").alias("vec_id"), "component"
    )
    w = W.partitionBy("component")
    return (
        emb.select("vec_id")
        .join(F.broadcast(cc), "vec_id", "left")
        .withColumn("component", F.coalesce("component", F.col("vec_id")))
        .select(
            "vec_id",
            "component",
            F.count(F.lit(1)).over(w).cast("bigint").alias("component_size"),
            (F.col("vec_id") == F.min("vec_id").over(w)).alias("keep"),
        )
        .orderBy("vec_id")
    )


@query(
    "qb29_kmeans_embeddings",
    oracle=None,  # iterative fit: rows-only + property tests (test_vectors)
    tags=("vector", "ml"),
)
def qb29_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means over the embedding column (k=8, 5
    fixed iterations) -> (vec_id, cluster, sq_dist) plus per-cluster
    size. The coarse-clustering stage that bounds semantic dedup and
    IVF-style ANN at scale; see ml/kmeans.py for the per-iteration
    plan (literal-centroid JVM argmin, one shuffle per iteration,
    grouped-agg pandas UDAF mean).

    Not SQL-expressible (iterative); property tests pin determinism
    under repartitioning, monotone nonincreasing cost, and
    transform/fit assignment agreement.
    """
    from pyspark.sql import Window as W

    from pyspark_distributed_kmodes_spark.ml.kmeans import kmeans_fit

    emb = table(spark, sf_dir, "embeddings")
    model = kmeans_fit(emb, k=8, iters=5)
    out = model.transform(emb)
    w = W.partitionBy("cluster")
    return out.select(
        "vec_id",
        "cluster",
        F.round("sq_dist", 6).alias("sq_dist"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cluster_size"),
    ).orderBy("vec_id")


@query(
    "qb30_semantic_dedup_scaled",
    oracle=None,  # approximate-by-design: recall property-tested vs exact b28
    tags=("vector", "dedup", "ml"),
)
def qb30_semantic_dedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for semantic dedup (SemDeDup proper): k-means
    coarse clusters bound the candidate space, cosine pairs are scored
    WITHIN a cluster only, then components -> keep-one — so pair
    generation is corpus²/k instead of corpus², and each cluster's
    pair join is an equi-join on the cluster id rather than a global
    cross product. Misses only cross-cluster near-dups (pairs whose
    members quantize apart); recall vs the exact b28 labeling is
    property-tested.

    Plan: one k-means fit (iters bounded shuffles), one (cluster,
    vec) shuffle for the self-join, JVM cosine on the joined rows, CC
    on the surviving pair list, one broadcast join back. No stage
    holds more than one cluster's candidates per task.
    """
    from pyspark.sql import Window as W

    from pyspark_distributed_kmodes_spark.functions.graph import connected_components
    from pyspark_distributed_kmodes_spark.ml.kmeans import kmeans_fit

    emb = table(spark, sf_dir, "embeddings")
    model = kmeans_fit(emb, k=8, iters=3)
    assigned = model.transform(emb).select("vec_id", "cluster").join(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("vec")), "vec_id"
    )
    a = assigned.select(
        F.col("cluster"), F.col("vec_id").alias("vec_a"), F.col("vec").alias("va")
    )
    b = assigned.select(
        F.col("cluster"), F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb")
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine_sim(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.85)
        .select("vec_a", "vec_b")
    )
    cc = connected_components(pairs, "vec_a", "vec_b").select(
        F.col("vertex").alias("vec_id"), "component"
    )
    w = W.partitionBy("component")
    return (
        emb.select("vec_id")
        .join(F.broadcast(cc), "vec_id", "left")
        .withColumn("component", F.coalesce("component", F.col("vec_id")))
        .select(
            "vec_id",
            "component",
            F.count(F.lit(1)).over(w).cast("bigint").alias("component_size"),
            (F.col("vec_id") == F.min("vec_id").over(w)).alias("keep"),
        )
        .orderBy("vec_id")
    )


@query("qe15_pca_variance", oracle=None, tags=("vector", "ml"))
def qe15_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA variance report: fit 8 components over the
    embedding corpus (ml/pca.py — per-batch d×d covariance partials,
    driver eigendecomposition) and report each component's eigenvalue
    with the explained and cumulative variance ratios — the "how many
    dimensions does this embedding space really have?" diagnostic run
    before IVF list sizing, semantic-dedup thresholds, or dimension
    truncation.

    Rows-only by nature (eigendecomposition isn't SQL); the property
    suite pins the trace identity, orthonormality, projected-variance
    == eigenvalue, and monotone reconstruction error. Scalar columns
    only (driver canonicalizer contract).
    """
    from pyspark_distributed_kmodes_spark.ml.pca import pca_fit

    emb = table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, k=8)
    ratios = model.explained_ratio()
    cum = 0.0
    rows = []
    for i, (ev, r) in enumerate(zip(model.eigenvalues, ratios)):
        cum += r
        rows.append((i, float(ev), float(r), float(cum)))
    return spark.createDataFrame(
        rows, "component int, eigenvalue double, explained_ratio double, cum_ratio double"
    ).orderBy("component")
