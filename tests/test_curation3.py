"""Property tests for the z-suite (operators/curation3.py): sampling
determinism and weight sensitivity, containment on constructed
subset/superset docs, OOV accounting, and correlation bounds."""

import math

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_z01_matches_local_reimplementation(spark):
    """The A-ES key is pure arithmetic on md5 — a local Python
    reimplementation over the same rows must select the same sample."""
    import hashlib

    from pyspark_distributed_kmodes_spark.operators.curation3 import (
        _SAMPLE_K,
        qe01_weighted_reservoir_sample,
    )
    from pyspark_distributed_kmodes_spark.sources.tables import table

    rows = qe01_weighted_reservoir_sample(spark, SF).collect()
    docs = table(spark, SF, "documents").select("lang", "doc_id", "text").collect()
    by_lang = {}
    for r in docs:
        u = (int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) + 0.5) / 2**32
        w = len(r.text.split(" "))
        by_lang.setdefault(r.lang, []).append((-math.log(u) / w, r.doc_id))
    expect = []
    for lang in sorted(by_lang):
        for rk, (_, doc_id) in enumerate(sorted(by_lang[lang])[:_SAMPLE_K], 1):
            expect.append((lang, rk, doc_id))
    assert [(r.lang, r.rk, r.doc_id) for r in rows] == expect


def test_z01_partitioning_invariant(spark):
    """Sample selection must not change with input partitioning."""
    from pyspark_distributed_kmodes_spark.operators.curation3 import (
        qe01_weighted_reservoir_sample,
    )

    a = qe01_weighted_reservoir_sample(spark, SF).collect()
    # run again (fresh plan) — deterministic output regardless of plan
    b = qe01_weighted_reservoir_sample(spark, SF).repartition(7).orderBy("lang", "rk").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in sorted(b, key=lambda r: (r.lang, r.rk))]


def test_z02_subset_doc_has_containment_one(spark):
    """A doc whose shingles are a strict subset of a longer doc must be
    reported with containment 1.0 in that direction only."""
    from pyspark_distributed_kmodes_spark.operators.curation3 import _CONTAIN_T

    # build a tiny corpus through the same operator internals
    from pyspark_distributed_kmodes_spark.operators import curation3 as m

    d = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta"),  # subset of 1
            (3, "totally different words here now"),
        ],
        ["doc_id", "text"],
    )
    import unittest.mock as mock

    with mock.patch.object(m, "table", lambda spark, sf, name: d):
        rows = m.qe02_containment_pairs(spark, "ignored").collect()
    got = {(r.doc_a, r.doc_b): r.containment for r in rows}
    assert got.get((2, 1)) == 1.0
    # doc 1 is NOT contained in doc 2 (only 2/4 of its shingles match)
    assert (1, 2) not in got
    assert all(c >= _CONTAIN_T for c in got.values())


def test_z03_oov_accounting(spark):
    """OOV counts are bounded by token counts and the global token sum
    matches the corpus."""
    from pyspark_distributed_kmodes_spark.operators.curation3 import qe03_oov_rate
    from pyspark_distributed_kmodes_spark.sources.tables import table

    rows = qe03_oov_rate(spark, SF).collect()
    total = (
        table(spark, SF, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .count()
    )
    assert sum(r.n_tokens for r in rows) == total
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert 0.0 <= r.oov_rate <= 1.0


def test_z04_rare_strata_below_threshold(spark):
    """Every reported stratum is genuinely below the threshold, and no
    below-threshold stratum is missing."""
    from pyspark_distributed_kmodes_spark.operators.curation3 import (
        _MIN_STRATUM,
        qe04_rare_strata_audit,
    )
    from pyspark_distributed_kmodes_spark.sources.tables import table

    rows = qe04_rare_strata_audit(spark, SF).collect()
    truth = {
        (r.lang, r.source): r.n
        for r in table(spark, SF, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r.n < _MIN_STRATUM
    }
    assert {(r.lang, r.source): r.n_docs for r in rows} == truth


def test_z05_pearson_in_bounds(spark):
    """Pearson r lies in [-1, 1] for every source."""
    from pyspark_distributed_kmodes_spark.operators.curation3 import (
        qe05_length_quality_corr,
    )

    rows = qe05_length_quality_corr(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert -1.0 - 1e-9 <= r.pearson_r <= 1.0 + 1e-9


def test_z28_compression_separates_repetition(spark):
    """Repetitive text must compress far better than diverse text, and
    the report must be invariant to input partitioning."""
    import unittest.mock as mock

    from pyspark_distributed_kmodes_spark.operators import text as m

    rows = [(i, "spam " * 200, "rep") for i in range(5)] + [
        (i + 10, " ".join(f"w{i}x{j}" for j in range(200)), "div") for i in range(5)
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    with mock.patch.object(m, "table", lambda spark, sf, name: d):
        got = {r.source: r.avg_ratio for r in m.qe28_compression_quality(spark, "x").collect()}
        d7 = d.repartition(7)
        with mock.patch.object(m, "table", lambda spark, sf, name: d7):
            got7 = {
                r.source: r.avg_ratio for r in m.qe28_compression_quality(spark, "x").collect()
            }
    assert got["rep"] < 0.05  # near-total compression
    assert got["div"] > 0.2  # diverse text resists
    assert got == got7  # partitioning-invariant


def test_pipeline_compression_and_sample_stages(spark):
    """The cascade-API forms of z28/z01 compose with the existing
    stages and keep their semantics."""
    from pyspark_distributed_kmodes_spark import pipeline as P

    rows = [(1, "spam " * 100, "en"), (2, " ".join(f"w{j}" for j in range(100)), "en"),
            (3, " ".join(f"v{j}" for j in range(50)), "fr")]
    d = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    kept = P.compression_filter(d).select("doc_id").collect()
    assert {r.doc_id for r in kept} == {2, 3}  # doc 1 too compressible
    sampled = P.weighted_sample(d, k_per_stratum=1)
    assert sampled.count() == 2  # one per lang
    # deterministic: same pick on rerun
    assert sorted(r.doc_id for r in sampled.collect()) == sorted(
        r.doc_id for r in P.weighted_sample(d.repartition(5), k_per_stratum=1).collect()
    )
