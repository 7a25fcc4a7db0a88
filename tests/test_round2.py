"""Round-2 regression tests: stop-shingle cap, blocked exact top-k,
null-safe k-modes, auto-sized ensemble, model persistence, atomic as-of
payload, derived streaming output mode, short-doc shingle guard."""

import pandas as pd
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------- text


def test_short_doc_shingles_no_crash(spark):
    """Docs with <3 words must yield zero shingles, not a slice error."""
    from pyspark_distributed_kmodes_spark.operators.text import ngram_jaccard_pairs

    d = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "three words here"), (4, "three words here")],
        ["doc_id", "text"],
    )
    rows = ngram_jaccard_pairs(d, threshold=0.2).collect()
    # only docs 3 and 4 share a shingle (identical text, jaccard 1.0)
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in rows] == [(3, 4, 1.0)]


def test_stop_shingle_cap_excludes_hot_shingle(spark):
    """A shingle present in >max_df docs must not generate pairs."""
    from pyspark_distributed_kmodes_spark.operators.text import ngram_jaccard_pairs

    # 50 docs all share the boilerplate shingle "click here now";
    # docs 0 and 1 additionally share a genuine duplicate body
    docs = [(i, f"click here now unique{i} filler{i} tail{i}") for i in range(2, 52)]
    docs += [(0, "click here now real dup body"), (1, "click here now real dup body")]
    d = spark.createDataFrame(docs, ["doc_id", "text"])

    uncapped = ngram_jaccard_pairs(d, threshold=0.01, max_df=None).collect()
    capped = ngram_jaccard_pairs(d, threshold=0.01, max_df=10).collect()

    # uncapped: the hot shingle connects every doc pair (52 choose 2)
    assert len(uncapped) == 52 * 51 // 2
    # capped: only the genuine duplicate pair survives, via its
    # non-boilerplate shingles
    assert [(r.doc_a, r.doc_b) for r in capped] == [(0, 1)]


# ------------------------------------------------------------- vectors


def test_exact_topk_multiblock_matches_single_block(spark, sf_dir):
    """Block-partitioned exact top-k must be invariant to block count."""
    from pyspark_distributed_kmodes_spark.operators.vectors import exact_topk
    from pyspark_distributed_kmodes_spark.sources.tables import table

    emb = table(spark, sf_dir, "embeddings")
    one = exact_topk(spark, emb, k=3, max_block_rows=10**9).orderBy("vec_id", "rank").collect()
    many = exact_topk(spark, emb, k=3, max_block_rows=100).orderBy("vec_id", "rank").collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]


def test_exact_topk_tie_complete(spark):
    """With >k tied neighbors, the lowest neighbor ids must win."""
    from pyspark_distributed_kmodes_spark.operators.vectors import exact_topk

    # 12 identical vectors: every neighbor ties at sim=1.0; top-3 of
    # vec 0 must be neighbors 1,2,3 (id asc), not argpartition leftovers
    rows = [(i, [1.0, 0.0]) for i in range(12)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = exact_topk(spark, emb, k=3).filter(F.col("vec_id") == 0).orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [1, 2, 3]


# -------------------------------------------------------------- kmodes


def test_kmodes_null_values(spark):
    """NULL categoricals cluster consistently (sentinel fold), no crash."""
    from pyspark_distributed_kmodes_spark.ml.kmodes import KModes

    df = spark.createDataFrame(
        [("a", None), ("a", None), ("a", None), ("b", "y"), ("b", "y"), (None, "y")],
        ["c1", "c2"],
    )
    model = KModes(n_clusters=2, cols=["c1", "c2"], seed=1).fit(df)
    assert len(model.modes) == 2
    preds = model.transform(df).select("prediction").collect()
    assert len({r.prediction for r in preds}) == 2
    # the three ("a", NULL) rows land together
    p = model.transform(df).collect()
    a_null = {r.prediction for r in p if r.c1 == "a"}
    assert len(a_null) == 1


def test_kmodes_null_distributed_path(spark):
    """Same data through the distributed Lloyd loop (COMBO_THRESHOLD=0)."""
    from pyspark_distributed_kmodes_spark.ml import kmodes as km

    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", "y"), ("b", "y")], ["c1", "c2"]
    )
    est = km.KModes(n_clusters=2, cols=["c1", "c2"], seed=1)
    old = km.KModes.COMBO_THRESHOLD
    km.KModes.COMBO_THRESHOLD = 0
    try:
        model = est.fit(df)
    finally:
        km.KModes.COMBO_THRESHOLD = old
    assert len(model.modes) == 2
    assert model.cost == 0.0  # two pure clusters → zero Hamming cost


def test_ensemble_auto_partitions(spark):
    """n_partitions=None derives the group count; fit still works."""
    from pyspark_distributed_kmodes_spark.ml.kmodes import EnsembleKModes

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")] * 10, ["c1", "c2"]
    )
    est = EnsembleKModes(n_partitions=None, n_clusters=2, seed=3, cols=("c1", "c2"))
    model = est.fit(df)
    assert len(model.modes) == 2
    assert est.indexes.count() == 40  # A9 .indexes: one row per input


def test_kmodes_model_save_load(spark, tmp_path):
    from pyspark_distributed_kmodes_spark.ml.kmodes import KModes, KModesModel

    df = spark.createDataFrame([("a", "x")] * 3 + [("b", "y")] * 3, ["c1", "c2"])
    model = KModes(n_clusters=2, cols=["c1", "c2"], seed=1).fit(df)
    path = str(tmp_path / "kmodes.json")
    model.save(path)
    loaded = KModesModel.load(path)
    assert loaded.modes == model.modes and loaded.cols == model.cols
    a = model.transform(df).select("prediction").collect()
    b = loaded.transform(df).select("prediction").collect()
    assert a == b


def test_spark_kmodes_pipeline_save_load(spark, tmp_path):
    from pyspark_distributed_kmodes_spark.ml.kmodes import SparkKModes, SparkKModesModel

    df = spark.createDataFrame([("a", "x")] * 3 + [("b", "y")] * 3, ["c1", "c2"])
    model = SparkKModes(k=2, inputCols=["c1", "c2"], seed=1).fit(df)
    path = str(tmp_path / "spark_kmodes_model")
    model.save(path)
    loaded = SparkKModesModel.load(path)
    assert loaded.clusters == model.clusters
    assert loaded.transform(df).collect() == model.transform(df).collect()


# ---------------------------------------------------------------- asof


def test_asof_payload_atomic(spark):
    """A NULL in the latest right row must NOT be back-filled from an
    older right row — the payload is one struct from one row."""
    from pyspark_distributed_kmodes_spark.functions.asof import asof_join

    left = spark.createDataFrame([(1, 100)], ["k", "lts"])
    right = spark.createDataFrame(
        [(1, 10, "old_a", "old_b"), (1, 50, "new_a", None)],
        ["k", "rts", "pa", "pb"],
    )
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts", payload=["pa", "pb"]).collect()
    assert len(out) == 1
    r = out[0]
    # as-of row is rts=50: pa from it, pb stays NULL (not "old_b")
    assert r.pa == "new_a" and r.pb is None


# ----------------------------------------------------------- streaming


def test_run_available_now_append_for_dedup(spark, sf_dir):
    """Non-aggregated streams must run in append mode automatically."""
    from pyspark_distributed_kmodes_spark.streaming.jobs import (
        dedup_stream,
        events_stream,
        run_available_now,
    )

    ev = events_stream(spark, sf_dir)
    name = run_available_now(dedup_stream(ev), "t_r2_dedup_auto")
    n = spark.sql(f"SELECT COUNT(*) AS n FROM {name}").first().n
    assert n > 0


# -------------------------------------------------------------- window


def test_q23_window_is_partitioned(spark, sf_dir):
    """The range-frame plan must not contain an unpartitioned window."""
    from pyspark_distributed_kmodes_spark.operators.window import q23_range_frame

    plan = q23_range_frame(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "bucket" in line  # partition key present in every spec


# ------------------------------------------------------------ pipeline


def test_pipeline_stages_compose(spark, sf_dir):
    """The composable pipeline API: each stage shrinks (or keeps) the
    corpus, ids remain unique, and packing covers every surviving doc."""
    from pyspark.sql import functions as F

    from pyspark_distributed_kmodes_spark import pipeline as P
    from pyspark_distributed_kmodes_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents")
    n0 = docs.count()
    q = P.quality_filter(docs)
    n1 = q.count()
    assert 0 < n1 <= n0
    d1 = P.exact_dedup(q)
    n2 = d1.count()
    assert 0 < n2 <= n1
    assert d1.select("doc_id").distinct().count() == n2
    d2 = P.near_dedup(d1)
    n3 = d2.count()
    assert 0 < n3 <= n2
    train = d2.filter(F.col("source") != "src2")
    ev = d2.filter(F.col("source") == "src2")
    clean = P.decontaminate(train, ev, min_shared_shingles=3)
    assert clean.count() <= train.count()
    packed = P.pack_sequences(clean)
    assert packed.count() == clean.count()
    assert packed.filter(F.col("pack_id") < 0).count() == 0


def test_pipeline_quality_repetition_cap(spark):
    from pyspark_distributed_kmodes_spark import pipeline as P

    rows = [
        (1, " ".join(["spam ham"] * 30)),          # one bigram dominates
        (2, " ".join(f"w{i} x{i}" for i in range(30))),  # diverse
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = P.quality_filter(d, min_words=5, min_unique_ratio=0.0, max_top_bigram_frac=0.5)
    assert [r.doc_id for r in out.collect()] == [2]


def test_pipeline_stage_metrics_observe(spark, sf_dir):
    """with_stage_metrics must report counters that match an explicit
    aggregation, from the SAME single action (no second scan)."""
    from pyspark.sql import functions as F

    from pyspark_distributed_kmodes_spark import pipeline as P
    from pyspark_distributed_kmodes_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents")
    staged, obs = P.with_stage_metrics(P.quality_filter(docs), "quality")
    n_action = staged.count()
    got = obs.get
    exact = (
        P.quality_filter(docs)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("chars"),
        )
        .first()
    )
    assert got["n_rows"] == n_action == exact.n
    assert got["n_null_text"] == 0
    assert got["total_chars"] == exact.chars
    assert abs(got["avg_chars"] - exact.chars / exact.n) < 1e-6
