"""m22-style SEMANTIC invariants for the round-3 rows (the qb-suite),
extending the program from tests/test_semantics_q.py (q01-q50) and
tests/test_semantics_q2.py (q51-q99) to the next-oldest driver rows
ahead of their eventual re-certification. Same idea: first-principles
sign/bound/algebraic identities and independent python re-derivations
that the Spark==DuckDB hash cannot check, because both engines would
share a wrong reading of the spec.

Keys covered: qb02, qb10, qb12, qb17, qb19, qb21, qb24, qb25, qb31,
qb36, qb40, qb42 (12 keys)."""

from collections import Counter, defaultdict

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_o02_right_join_preserves_nation(spark, sf_dir, reg, duck):
    """Right-outer law: every nation appears; NULL-supplier rows are
    exactly the nations with no qualifying supplier; each qualifying
    supplier appears exactly once."""
    rows = reg["qo02_right_join"].fn(spark, sf_dir).collect()
    nations = {n for (n,) in duck.execute("SELECT n_name FROM nation").fetchall()}
    no_sup = {
        n
        for (n,) in duck.execute(
            "SELECT n_name FROM nation WHERE n_nationkey NOT IN "
            "(SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)"
        ).fetchall()
    }
    n_sup = duck.execute(
        "SELECT COUNT(*) FROM supplier WHERE s_acctbal > 9000"
    ).fetchone()[0]
    assert {r.n_name for r in rows} == nations
    assert {r.n_name for r in rows if r.s_name is None} == no_sup
    assert sum(1 for r in rows if r.s_name is not None) == n_sup


def test_qb10_bag_algebra_identities(spark, sf_dir, reg, duck):
    """Bag-semantics laws: per key, INTERSECT ALL yields min(c, s)
    copies and INTERSECT ALL + EXCEPT ALL reassembles the left side's
    multiplicity exactly."""
    per = defaultdict(dict)
    for r in reg["o10_intersect_except_all"].fn(spark, sf_dir).collect():
        per[r.nationkey][r.op] = r.n
    c = dict(duck.execute("SELECT c_nationkey, COUNT(*) FROM customer GROUP BY 1").fetchall())
    s = dict(duck.execute("SELECT s_nationkey, COUNT(*) FROM supplier GROUP BY 1").fetchall())
    assert per  # non-degenerate
    for k, d in per.items():
        assert d.get("intersect_all", 0) == min(c.get(k, 0), s.get(k, 0))
        assert d.get("intersect_all", 0) + d.get("except_all", 0) == c.get(k, 0)


def test_qb12_logprob_bounds(spark, sf_dir, reg, duck):
    """A unigram LM's average log-probability is strictly negative,
    word counts are positive, and every document scores."""
    rows = reg["o12_unigram_logprob"].fn(spark, sf_dir).collect()
    n_docs = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert len(rows) == n_docs
    assert all(r.avg_logprob < 0 for r in rows)
    assert all(r.n_words > 0 for r in rows)


def test_qb17_promo_pct_is_a_percentage(spark, sf_dir, reg):
    """A revenue share lies in [0, 100] and months are calendar
    months."""
    rows = reg["o17_promo_revenue"].fn(spark, sf_dir).collect()
    assert rows
    assert all(0.0 <= r.promo_pct <= 100.0 for r in rows)
    assert all(1 <= r.l_month <= 12 for r in rows)


def test_qb19_retention_laws(spark, sf_dir, reg):
    """Cohort laws: week 0 retains the whole cohort, no week retains
    more than the cohort, and the reported ratio IS n_active divided
    by cohort_size."""
    rows = reg["o19_retention_cohorts"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_active <= r.cohort_size
        if r.weeks_since == 0:
            assert r.n_active == r.cohort_size
        assert abs(r.retention - r.n_active / r.cohort_size) < 1e-5


def test_qb21_returned_customers_really_returned(spark, sf_dir, reg, duck):
    """Every listed customer has at least one 'R' lineitem, revenue is
    positive, and customers are not repeated."""
    rows = reg["qb21_returned_items"].fn(spark, sf_dir).collect()
    returned = {
        k
        for (k,) in duck.execute(
            "SELECT DISTINCT o_custkey FROM orders JOIN lineitem "
            "ON l_orderkey = o_orderkey WHERE l_returnflag = 'R'"
        ).fetchall()
    }
    assert rows
    assert all(r.c_custkey in returned for r in rows)
    assert all(r.revenue > 0 for r in rows)
    assert len({r.c_custkey for r in rows}) == len(rows)


def test_qb24_quantities_rederived_row_by_row(spark, sf_dir, reg, duck):
    """Independent re-derivation: each reported order's total_qty is
    the raw lineitem quantity sum and o_totalprice matches the orders
    table, row by row."""
    rows = reg["qb24_large_volume_customers"].fn(spark, sf_dir).collect()
    qty = dict(duck.execute("SELECT l_orderkey, SUM(l_quantity) FROM lineitem GROUP BY 1").fetchall())
    price = dict(duck.execute("SELECT o_orderkey, o_totalprice FROM orders").fetchall())
    assert rows
    for r in rows:
        assert abs(qty[r.o_orderkey] - r.total_qty) < 1e-9
        assert price[r.o_orderkey] == r.o_totalprice


def test_qb25_count_of_counts_rederived(spark, sf_dir, reg, duck):
    """Full python re-derivation of the TPC-H Q13 distribution: the
    (orders-per-customer, customer-count) histogram from a raw left
    join must equal the query output exactly."""
    rows = {(r.c_count, r.custdist) for r in
            reg["qb25_customer_distribution"].fn(spark, sf_dir).collect()}
    per = dict(
        duck.execute(
            "SELECT c_custkey, COUNT(o_orderkey) FROM customer "
            "LEFT JOIN orders ON o_custkey = c_custkey GROUP BY 1"
        ).fetchall()
    )
    assert rows == set(Counter(per.values()).items())


def test_qb31_filter_respects_its_own_threshold(spark, sf_dir, reg, duck):
    """Every surviving doc sits at or above the single reported p10
    threshold, and the kept fraction is near 90% (approx quantile,
    loose band)."""
    rows = reg["qb31_quality_quantile_filter"].fn(spark, sf_dir).collect()
    n_docs = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    p10 = rows[0].p10
    assert all(r.p10 == p10 for r in rows)
    assert all(r.unique_ratio >= p10 for r in rows)
    assert 0.80 <= len(rows) / n_docs <= 1.0


def test_qb36_sketch_set_laws(spark, sf_dir, reg):
    """Theta-sketch estimates must obey set algebra: intersection no
    larger than union, Jaccard in [0,1] and consistent with its own
    numerator/denominator."""
    rows = reg["qb36_theta_source_overlap"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert r.est_common_tokens <= r.est_union_tokens
        assert abs(r.est_jaccard - r.est_common_tokens / r.est_union_tokens) < 1e-5


def test_qb40_cms_never_underestimates(spark, sf_dir, reg):
    """The count-min law: sketch counts are >= exact counts, no token
    exceeds the corpus total, and the reported total is one number."""
    rows = reg["qb40_cms_heavy_hitters"].fn(spark, sf_dir).collect()
    assert rows
    total = rows[0].n_total
    for r in rows:
        assert r.cms_n >= r.exact_n
        assert r.exact_n <= r.n_total == total


def test_qb42_splits_partition_corpus(spark, sf_dir, reg, duck):
    """train/val/test must PARTITION each source: doc counts and char
    totals reassemble the raw per-source totals exactly."""
    agg = defaultdict(lambda: [0, 0])
    splits = set()
    for r in reg["qb42_train_val_test_split"].fn(spark, sf_dir).collect():
        agg[r.source][0] += r.n_docs
        agg[r.source][1] += r.total_chars
        splits.add(r.split)
    exp = {
        s: (n, c)
        for s, n, c in duck.execute(
            "SELECT source, COUNT(*), SUM(n_chars) FROM documents GROUP BY 1"
        ).fetchall()
    }
    assert {s: tuple(v) for s, v in agg.items()} == exp
    assert splits == {"train", "val", "test"}
