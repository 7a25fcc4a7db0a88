"""Similarity-search property tests: exact top-k sanity + LSH recall."""

import numpy as np
import pytest
from pyspark.sql import types as T

from pyspark_distributed_kmodes_spark.operators.vectors import exact_topk, qo60_cosine_topk, qo61_ann_lsh
from pyspark_distributed_kmodes_spark.sources.tables import table

VEC_SCHEMA = T.StructType(
    [T.StructField("vec_id", T.LongType()), T.StructField("embedding", T.ArrayType(T.FloatType()))]
)


def test_planted_duplicate_is_top1(spark):
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(20, 8)).astype(np.float32)
    vecs[7] = vecs[3]  # plant an exact duplicate
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    top = {(r.vec_id, r.rank): r.neighbor_id for r in exact_topk(spark, df, k=1).collect()}
    assert top[(3, 1)] == 7 and top[(7, 1)] == 3


def test_topk_is_symmetric_on_duplicate_sim(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    out = qo60_cosine_topk(spark, sf_dir).collect()
    assert len(out) == emb.count() * 5
    by_vec = {}
    for r in out:
        by_vec.setdefault(r.vec_id, []).append(r)
    for vid, rows in by_vec.items():
        sims = [r.cos_sim for r in sorted(rows, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True), f"ranks unordered for {vid}"
        assert all(r.neighbor_id != vid for r in rows)


def test_lsh_recall_of_exact_top1(spark, sf_dir):
    """The LSH path must recover a decent share of true top-1 neighbors
    (random-hyperplane LSH, 1 table × 16 bits — recall is limited by
    design; the scale win is the sub-quadratic candidate set)."""
    exact = {r.vec_id: r.neighbor_id for r in qo60_cosine_topk(spark, sf_dir).collect() if r.rank == 1}
    approx = {}
    for r in qo61_ann_lsh(spark, sf_dir).collect():
        if r.rank == 1:
            approx[r.vec_id] = r.neighbor_id
    hits = sum(1 for v, n in approx.items() if exact.get(v) == n)
    assert len(approx) > 0
    assert hits / max(len(approx), 1) > 0.3


def test_ivf_recall_beats_lsh_floor(spark, sf_dir):
    """IVF with nprobe=4/16 must recover most true top-1 neighbors
    (probing a quarter of the space; far better than LSH on this
    low-similarity corpus)."""
    from pyspark_distributed_kmodes_spark.operators.vectors import qo68_ann_ivf

    exact = {r.vec_id: r.neighbor_id for r in qo60_cosine_topk(spark, sf_dir).collect() if r.rank == 1}
    approx = {r.vec_id: r.neighbor_id for r in qo68_ann_ivf(spark, sf_dir).collect() if r.rank == 1}
    hits = sum(1 for v, n in approx.items() if exact.get(v) == n)
    assert len(approx) >= 400  # nearly all vectors produce candidates
    assert hits / len(approx) > 0.5


def test_kmeans_fit_properties(spark, sf_dir):
    """Lloyd invariants: nonincreasing cost, exactly-k centroid slots,
    bit-identical centroids and assignments under repartitioning (the
    decimal-sum update makes the mean reduction-order independent)."""
    from pyspark_distributed_kmodes_spark.ml.kmeans import kmeans_fit
    from pyspark_distributed_kmodes_spark.sources.tables import table

    emb = table(spark, sf_dir, "embeddings")
    m = kmeans_fit(emb, k=4, iters=4)
    assert len(m.centroids) == 4 and len(m.costs) == 4
    assert all(m.costs[i + 1] <= m.costs[i] + 1e-9 for i in range(3))
    m2 = kmeans_fit(emb.repartition(17), k=4, iters=4)
    assert m.centroids == m2.centroids and m.costs == m2.costs
    a1 = {r.vec_id: r.cluster for r in m.transform(emb).collect()}
    a2 = {r.vec_id: r.cluster for r in m2.transform(emb.repartition(5)).collect()}
    assert a1 == a2


def test_kmeans_transform_is_nearest_centroid(spark, sf_dir):
    """Each assignment must actually be the argmin centroid (ties to the
    lowest index), cross-checked in numpy."""
    import numpy as np

    from pyspark_distributed_kmodes_spark.ml.kmeans import kmeans_fit
    from pyspark_distributed_kmodes_spark.sources.tables import table

    emb = table(spark, sf_dir, "embeddings").limit(100)
    m = kmeans_fit(emb, k=3, iters=2)
    cents = np.array(m.centroids)
    vecs = {x.vec_id: np.array(x.embedding, dtype=np.float64) for x in emb.collect()}
    for r in m.transform(emb).collect():
        d = ((vecs[r.vec_id][None, :] - cents) ** 2).sum(axis=1)
        assert r.cluster == int(np.argmin(d))
        assert abs(r.sq_dist - d[r.cluster]) < 1e-6


def test_kmeans_rejects_bad_params(spark, sf_dir):
    import pytest

    from pyspark_distributed_kmodes_spark.ml.kmeans import kmeans_fit
    from pyspark_distributed_kmodes_spark.sources.tables import table

    emb = table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError):
        kmeans_fit(emb, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(emb.limit(2), k=5)


def test_semantic_dedup_scaled_recall(spark, sf_dir):
    """The clustered (within-cluster-only) semantic dedup must agree
    with the exact b28 labeling on most duplicate decisions: every pair
    it keeps is a true near-dup subset, and it recovers a high share of
    the exact path's non-singleton memberships."""
    from pyspark_distributed_kmodes_spark.operators.vectors import (
        qb28_semantic_dedup,
        qb30_semantic_dedup_scaled,
    )

    exact = {r.vec_id: (r.component, r.component_size) for r in qb28_semantic_dedup(spark, sf_dir).collect()}
    scaled = {r.vec_id: (r.component, r.component_size) for r in qb30_semantic_dedup_scaled(spark, sf_dir).collect()}
    assert set(exact) == set(scaled)  # every vector labeled in both
    # soundness: scaled components only merge vectors the exact path also merges
    # (within-cluster pairs are a subset of all pairs)
    from collections import defaultdict

    exact_groups = defaultdict(set)
    for v, (c, _) in exact.items():
        exact_groups[c].add(v)
    scaled_groups = defaultdict(set)
    for v, (c, _) in scaled.items():
        scaled_groups[c].add(v)
    for members in scaled_groups.values():
        containers = {next(c for c, g in exact_groups.items() if v in g) for v in members}
        assert len(containers) == 1  # never merges across true components
    # recall: most vectors the exact path marks duplicate are caught
    dup_exact = {v for v, (_, s) in exact.items() if s >= 2}
    dup_scaled = {v for v, (_, s) in scaled.items() if s >= 2}
    if dup_exact:
        assert len(dup_scaled & dup_exact) / len(dup_exact) > 0.6


def test_kmeans_save_load_roundtrip(spark, sf_dir, tmp_path):
    """Persisted model must reproduce identical assignments."""
    from pyspark_distributed_kmodes_spark.ml.kmeans import KMeansModel, kmeans_fit
    from pyspark_distributed_kmodes_spark.sources.tables import table

    emb = table(spark, sf_dir, "embeddings").limit(100)
    m = kmeans_fit(emb, k=3, iters=2)
    p = str(tmp_path / "kmeans.json")
    m.save(p)
    m2 = KMeansModel.load(p)
    assert m2.centroids == m.centroids and m2.costs == m.costs
    a1 = sorted((r.vec_id, r.cluster) for r in m.transform(emb).collect())
    a2 = sorted((r.vec_id, r.cluster) for r in m2.transform(emb).collect())
    assert a1 == a2
