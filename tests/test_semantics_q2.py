"""m22-style SEMANTIC invariants for the round-2 rows (q51-q99, the
LLM-pipeline suite) ahead of their round-11 re-certification — the
companion to tests/test_semantics_q.py (q01-q50). Same program:
first-principles sign/bound/algebraic identities and cross-QUERY
identities that the Spark==DuckDB hash cannot check because both
engines would share a wrong reading of the spec.

Keys covered: q51, q52, q53, q55, q56+q65 (cross), q60, q75, q87,
q88, q92, q93, q95 (determinism), q96, q99 (14 keys)."""

from collections import defaultdict

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_o51_profile_partitions_corpus(spark, sf_dir, reg, duck):
    """min <= avg <= max per cell, and the (lang, source) cells
    partition the documents table exactly."""
    rows = reg["qo51_lang_profile"].fn(spark, sf_dir).collect()
    total = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.n_docs > 0
        assert r.min_chars <= r.avg_chars <= r.max_chars


def test_qo52_quality_score_bounds(spark, sf_dir, reg):
    for r in reg["qo52_quality_score"].fn(spark, sf_dir).collect():
        assert r.n_words > 0
        assert r.chars_per_word > 0
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 < r.unique_ratio <= 1.0
        assert r.passes_quality in (0, 1)


def test_qo53_token_count_partitions_corpus(spark, sf_dir, reg, duck):
    rows = reg["qo53_token_count"].fn(spark, sf_dir).collect()
    total = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.total_tokens >= r.n_docs > 0  # every doc has >= 1 token
        assert r.total_words > 0


def test_o55_jaccard_pair_canon(spark, sf_dir, reg):
    """Pairs are canonical (a < b, no mirror duplicates) and the
    similarity is a true Jaccard: in (0, 1]."""
    rows = reg["qo55_ngram_jaccard"].fn(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert (r.doc_a, r.doc_b) not in seen
        seen.add((r.doc_a, r.doc_b))
        assert 0.0 < r.jaccard <= 1.0


def test_o56_o65_keeper_cross_identity(spark, sf_dir, reg, duck):
    """Cross-query identity: the two dedups share the fingerprint
    domain and their copy counts tile the corpus; the keep POLICIES
    differ by design (q56 keeps min doc_id, q65 keeps longest-then-
    lowest), so q65's keeper can never precede q56's min-id keeper and
    must EQUAL it on singleton groups."""
    q56 = {r.fingerprint: (r.n_copies, r.keeper_doc_id)
           for r in reg["qo56_exact_dedup"].fn(spark, sf_dir).collect()}
    q65 = {r.fingerprint: r.doc_id
           for r in reg["qo65_dedup_keep_best"].fn(spark, sf_dir).collect()}
    total = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert sum(n for n, _ in q56.values()) == total
    assert set(q65) == set(q56)
    for fp, doc in q65.items():
        n_copies, min_id = q56[fp]
        assert doc >= min_id
        if n_copies == 1:
            assert doc == min_id


def test_o60_topk_ranking_laws(spark, sf_dir, reg):
    """Per query vector: ranks consecutive from 1, cosine in [-1,1]
    nonincreasing with rank, and no self-neighbors."""
    per = defaultdict(list)
    for r in reg["qo60_cosine_topk"].fn(spark, sf_dir).collect():
        per[r.vec_id].append(r)
    assert per
    for vid, rows in per.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        sims = [r.cos_sim for r in rows]
        assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for s in sims)
        assert all(a >= b - 1e-9 for a, b in zip(sims, sims[1:]))
        assert all(r.neighbor_id != vid for r in rows)


def test_o75_decontamination_hit_contract(spark, sf_dir, reg):
    """A contaminated doc has a positive shared-shingle count and a
    concrete eval-doc attribution; counts are never negative."""
    rows = reg["qo75_decontamination"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_shared_shingles > 0
        assert r.top_eval_doc is not None


def test_q87_funnel_conversion_contract(spark, sf_dir, reg):
    """converted is binary; a conversion requires both timestamps in
    order and secs_to_convert equal to their difference; a
    non-conversion carries no latency."""
    rows = reg["qo87_event_funnel"].fn(spark, sf_dir).collect()
    assert any(r.converted == 1 for r in rows)
    for r in rows:
        assert r.converted in (0, 1)
        assert r.n_events > 0
        if r.converted == 1:
            assert r.first_signup is not None and r.first_purchase is not None
            assert r.first_purchase >= r.first_signup
            delta = (r.first_purchase - r.first_signup).total_seconds()
            assert abs(r.secs_to_convert - delta) < 1.0
        else:
            assert r.secs_to_convert is None


def test_q88_scd2_intervals_well_formed(spark, sf_dir, reg):
    """Per user: validity intervals are ordered and non-overlapping
    (valid_from strictly before valid_to when closed; successive
    valid_from never precedes the prior valid_to), with at most one
    open (NULL valid_to) current row."""
    per = defaultdict(list)
    for r in reg["qo88_scd2_history"].fn(spark, sf_dir).collect():
        per[r.user_id].append(r)
    assert per
    for rows in per.values():
        rows.sort(key=lambda r: r.valid_from)
        open_rows = [r for r in rows if r.valid_to is None]
        assert len(open_rows) <= 1
        for r in rows:
            assert r.n_events >= 1
            if r.valid_to is not None:
                assert r.valid_from < r.valid_to
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to is not None  # only the last row may be open
            assert b.valid_from >= a.valid_to


def test_o92_histogram_tiles_orders(spark, sf_dir, reg, duck):
    """Bucket counts per status sum to the status's row count — the
    histogram tiles the table with nothing dropped."""
    rows = reg["qo92_histogram"].fn(spark, sf_dir).collect()
    expect = dict(
        duck.execute("SELECT o_orderstatus, COUNT(*) FROM orders GROUP BY 1").fetchall()
    )
    per = defaultdict(int)
    for r in rows:
        assert r.n > 0
        assert r.bucket >= 0
        per[r.o_orderstatus] += r.n
    assert dict(per) == expect


def test_q93_moment_bounds(spark, sf_dir, reg, duck):
    """n matches an independent count, the mean sits inside the true
    [min, max], and the sample stddev is nonnegative and bounded by
    the range."""
    bounds = {
        f: (n, lo, hi)
        for f, n, lo, hi in duck.execute(
            "SELECT l_returnflag, COUNT(*), MIN(l_quantity), MAX(l_quantity) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    for r in reg["qo93_exact_stats"].fn(spark, sf_dir).collect():
        n, lo, hi = bounds[r.l_returnflag]
        assert r.n == n
        assert lo <= r.mean_qty <= hi
        assert 0.0 <= r.stddev_qty <= (hi - lo)


def test_o95_stratified_sample_deterministic(spark, sf_dir, reg, duck):
    """The seeded-hash sample is a function of the data, not the run:
    two invocations agree exactly, and no stratum over-samples its
    population."""
    a = sorted(map(tuple, reg["qo95_stratified_sample"].fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, reg["qo95_stratified_sample"].fn(spark, sf_dir).collect()))
    assert a == b
    pop = dict(duck.execute("SELECT lang, COUNT(*) FROM documents GROUP BY 1").fetchall())
    for lang, n_sampled, min_id, max_id in a:
        assert 0 < n_sampled <= pop[lang]
        assert min_id <= max_id


def test_q96_mixture_respects_quotas(spark, sf_dir, reg, duck):
    """The mixture fills each source's quota (40/20/10) with its
    LONGEST documents: n_docs == min(quota, population) and
    total_chars equals the independent top-quota sum."""
    quotas = {"src0": 40, "src1": 20, "src2": 10}
    rows = {r.source: (r.n_docs, r.total_chars)
            for r in reg["qo96_source_mixture"].fn(spark, sf_dir).collect()}
    assert set(rows) <= set(quotas)
    for src, quota in quotas.items():
        docs = sorted(
            duck.execute(
                "SELECT n_chars, doc_id FROM documents WHERE source = ?", [src]
            ).fetchall(),
            key=lambda t: (-t[0], t[1]),
        )
        if not docs:
            assert src not in rows
            continue
        take = docs[:quota]
        n, chars = rows[src]
        assert n == len(take)
        assert chars == sum(c for c, _ in take)


def test_q99_repetition_bounds(spark, sf_dir, reg):
    for r in reg["qo99_repetition_ratio"].fn(spark, sf_dir).collect():
        assert r.n_bigrams >= 0
        if r.n_bigrams > 0:
            assert 0.0 < r.top_bigram_frac <= 1.0
        assert r.repetitive in (0, 1)
