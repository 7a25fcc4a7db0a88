"""m22-style SEMANTIC invariants for the round-3 qc-suite (mixture
curation / dedup-at-scale / ingest rows), continuing the program of
tests/test_semantics_q.py / _q2.py / _qb.py: first-principles
sign/bound/partition/algebraic identities and python re-derivations
the Spark==DuckDB hash cannot check.

Keys covered: qc01, qc02, qc03, qc04, qc05, qc06, qc07, qc08, qc09,
qc10, qc11, qc12, qc13, qc14 (all 14)."""

import math
from collections import defaultdict

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_qc01_csv_roundtrip_rederived(spark, sf_dir, reg, duck):
    """The CSV ingest aggregate must reproduce the parquet truth: per
    segment, customer count and max key re-derived from the source."""
    rows = {r.c_mktsegment: (r.n_cust, r.max_custkey) for r in
            reg["qc01_csv_ingest_agg"].fn(spark, sf_dir).collect()}
    exp = {
        s: (n, mx)
        for s, n, mx in duck.execute(
            "SELECT c_mktsegment, COUNT(*), MAX(c_custkey) FROM customer GROUP BY 1"
        ).fetchall()
    }
    assert rows == exp


def test_qc02_jsonl_roundtrip_rederived(spark, sf_dir, reg, duck):
    """The custom JSONL data source must lose nothing: per (lang,
    source) counts and id ranges equal the parquet truth."""
    rows = {(r.lang, r.source): (r.n_docs, r.min_doc_id, r.max_doc_id) for r in
            reg["qc02_jsonl_datasource_agg"].fn(spark, sf_dir).collect()}
    exp = {
        (l, s): (n, a, b)
        for l, s, n, a, b in duck.execute(
            "SELECT lang, source, COUNT(*), MIN(doc_id), MAX(doc_id) "
            "FROM documents GROUP BY 1, 2"
        ).fetchall()
    }
    assert rows == exp


def test_qc03_component_sizes_self_consistent(spark, sf_dir, reg):
    """Connected components: each row's component_size equals the
    actual number of rows carrying that component id, and no doc
    appears twice."""
    rows = reg["qc03_dup_clusters_distributed"].fn(spark, sf_dir).collect()
    sizes = defaultdict(int)
    for r in rows:
        sizes[r.component] += 1
    assert all(sizes[r.component] == r.component_size for r in rows)
    assert len({r.doc_id for r in rows}) == len(rows)


def test_qc04_mixture_weights_simplex_and_monotone(spark, sf_dir, reg):
    """Temperature-scaled mixture weights are a distribution (sum 1)
    and order-preserving in source size (equal sizes get equal
    weights)."""
    rows = reg["qc04_temperature_mixture_weights"].fn(spark, sf_dir).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-6
    s = sorted(rows, key=lambda r: r.n_docs)
    assert all(a.weight <= b.weight + 1e-9 for a, b in zip(s, s[1:]))
    assert all(
        a.weight == b.weight for a in rows for b in rows if a.n_docs == b.n_docs
    )


def test_qc05_outlier_flag_is_a_threshold(spark, sf_dir, reg):
    """is_outlier must be a pure |robust_z| threshold: every flagged
    row sits strictly above every unflagged row."""
    rows = reg["qc05_mad_robust_zscores"].fn(spark, sf_dir).collect()
    assert all(r.is_outlier in (0, 1) for r in rows)
    outs = [abs(r.robust_z) for r in rows if r.is_outlier == 1]
    ins = [abs(r.robust_z) for r in rows if r.is_outlier == 0]
    if outs and ins:
        assert max(ins) < min(outs)


def test_qc06_tiers_partition_each_lang(spark, sf_dir, reg, duck):
    """Quality tiers partition every language's documents exactly."""
    per = defaultdict(int)
    for r in reg["qc06_logprob_quality_tiers"].fn(spark, sf_dir).collect():
        per[r.lang] += r.n_docs
    exp = dict(duck.execute("SELECT lang, COUNT(*) FROM documents GROUP BY 1").fetchall())
    assert per == exp


def test_qc07_entropy_bounds(spark, sf_dir, reg, duck):
    """Shannon laws: 0 <= H <= ln(k); normalized entropy in [0,1]; doc
    counts re-derived."""
    exp = dict(duck.execute("SELECT lang, COUNT(*) FROM documents GROUP BY 1").fetchall())
    for r in reg["qc07_mixture_entropy_report"].fn(spark, sf_dir).collect():
        assert 0.0 <= r.entropy <= math.log(r.n_sources) + 1e-9
        assert 0.0 <= r.norm_entropy <= 1.0 + 1e-9
        assert r.n_docs == exp[r.lang]


def test_qc08_overlap_coefficient_laws(spark, sf_dir, reg):
    """Szymkiewicz-Simpson laws: common <= min(|A|, |B|) and the
    coefficient IS common / min(|A|, |B|)."""
    rows = reg["qc08_source_overlap_matrix"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_common <= min(r.n_a, r.n_b)
        assert abs(r.overlap_coeff - r.n_common / min(r.n_a, r.n_b)) < 1e-5


def test_qc09_budget_is_integer_exact(spark, sf_dir, reg):
    """Integer-exact allocation: micro-weights sum to exactly 10^6,
    allocations are proportional, and ordering follows token counts."""
    rows = reg["qc09_token_budget_allocation"].fn(spark, sf_dir).collect()
    assert sum(r.weight_micro for r in rows) == 10**6
    assert all(r.alloc_tokens == r.weight_micro * 10 for r in rows)
    s = sorted(rows, key=lambda r: r.n_tokens)
    assert all(a.weight_micro <= b.weight_micro for a, b in zip(s, s[1:]))


def test_qc10_caps_partition_sources(spark, sf_dir, reg, duck):
    """kept + dropped reassembles every source's document count."""
    exp = dict(duck.execute("SELECT source, COUNT(*) FROM documents GROUP BY 1").fetchall())
    for r in reg["qc10_per_source_quality_caps"].fn(spark, sf_dir).collect():
        assert r.n_kept + r.n_dropped == exp[r.source]


def test_qc11_exclusivity_ratio_consistent(spark, sf_dir, reg):
    """Exclusive shingles are a subset and the ratio is their share."""
    for r in reg["qc11_shingle_novelty"].fn(spark, sf_dir).collect():
        assert 0 <= r.n_exclusive <= r.n_shingles
        assert abs(r.exclusive_ratio - r.n_exclusive / r.n_shingles) < 1e-5


def test_qc12_histogram_tiles_corpus(spark, sf_dir, reg, duck):
    """Histogram laws: buckets are disjoint and increasing, doc counts
    tile the corpus, and the cumulative fraction climbs to exactly 1."""
    rows = sorted(reg["qc12_seqlen_histogram"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.bucket)
    n_docs = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs
    assert all(r.lo_words <= r.hi_words for r in rows)
    assert all(a.hi_words < b.lo_words for a, b in zip(rows, rows[1:]))
    assert all(a.cum_doc_frac <= b.cum_doc_frac + 1e-9 for a, b in zip(rows, rows[1:]))
    assert abs(rows[-1].cum_doc_frac - 1.0) < 1e-6


def test_qc13_cohesion_bounds_and_partition(spark, sf_dir, reg, duck):
    """Cosine means live in [-1, 1] and labels partition the embedding
    table."""
    rows = reg["qc13_label_cohesion"].fn(spark, sf_dir).collect()
    n_vecs = duck.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    assert all(-1.0 - 1e-9 <= r.avg_cosine <= 1.0 + 1e-9 for r in rows)
    assert sum(r.n_vecs for r in rows) == n_vecs


def test_qc14_zipf_slope_sign(spark, sf_dir, reg):
    """A Zipf rank-frequency slope is negative by construction."""
    rows = reg["qc14_zipf_slope"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.zipf_slope < 0 for r in rows)
    assert all(r.n_terms > 0 for r in rows)
