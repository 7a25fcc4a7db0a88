"""Sketch accuracy properties: approximate distinct counts must land
within tolerance of exact (the rows-only stand-in for the hash oracle)."""

from pyspark_distributed_kmodes_spark.operators.relational2 import qo49_sketch_distinct


def test_sketch_estimates_within_tolerance(spark, sf_dir):
    for r in qo49_sketch_distinct(spark, sf_dir).collect():
        assert abs(r.approx_parts - r.exact_parts) / r.exact_parts < 0.1
        assert abs(r.hll_supps - r.exact_parts * 0) >= 0  # hll present
        # hll estimates supplier distinct (10 at sf0.001) — small sets are exact
        assert r.hll_supps > 0


def test_approx_percentile_accuracy(spark, sf_dir):
    from pyspark_distributed_kmodes_spark.functions.scalar_queries import qo91_approx_percentiles

    for r in qo91_approx_percentiles(spark, sf_dir).collect():
        assert abs(r.approx_median - r.exact_median) / r.exact_median < 0.02
        assert r.approx_p25 <= r.approx_median <= r.approx_p75


def test_theta_overlap_matches_exact_jaccard(spark, sf_dir):
    """Theta-sketch pairwise overlap estimates must land near the exact
    token-set intersections (small vocab at sf0.001 => near-exact)."""
    from pyspark.sql import functions as F

    from pyspark_distributed_kmodes_spark.operators.sketches import (
        _source_tokens,
        qb36_theta_source_overlap,
    )

    toks = _source_tokens(spark, sf_dir).distinct().collect()
    by_source = {}
    for r in toks:
        by_source.setdefault(r.source, set()).add(r.token)
    for r in qb36_theta_source_overlap(spark, sf_dir).collect():
        exact_i = len(by_source[r.source_a] & by_source[r.source_b])
        exact_u = len(by_source[r.source_a] | by_source[r.source_b])
        assert abs(r.est_common_tokens - exact_i) / max(exact_i, 1) < 0.05
        assert abs(r.est_union_tokens - exact_u) / max(exact_u, 1) < 0.05


def test_kll_quantiles_within_rank_tolerance(spark, sf_dir):
    """KLL quantile estimates must be within 2% RANK error of exact
    (the sketch's guarantee is on rank, not value)."""
    from pyspark_distributed_kmodes_spark.operators.sketches import qb37_kll_price_quantiles
    from pyspark_distributed_kmodes_spark.sources.tables import table

    prices = {}
    for r in table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice").collect():
        prices.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    for v in prices.values():
        v.sort()
    import bisect

    for r in qb37_kll_price_quantiles(spark, sf_dir).collect():
        vals = prices[r.l_returnflag]
        for p, est in [(0.25, r.kll_p25), (0.5, r.kll_p50), (0.75, r.kll_p75), (0.95, r.kll_p95)]:
            rank = bisect.bisect_left(vals, est) / len(vals)
            assert abs(rank - p) < 0.02, (r.l_returnflag, p, est, rank)


def test_hll_rollup_matches_exact_weekly_distinct(spark, sf_dir):
    """Weekly distinct-user estimates merged from daily HLL sketches
    must match exact weekly count-distinct within 5%."""
    from pyspark.sql import functions as F

    from pyspark_distributed_kmodes_spark.operators.sketches import qb38_hll_distinct_rollup
    from pyspark_distributed_kmodes_spark.sources.tables import table

    e = table(spark, sf_dir, "events")
    exact = {
        r.week: r.n
        for r in e.groupBy(F.date_trunc("week", "ts").alias("week"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows = qb38_hll_distinct_rollup(spark, sf_dir).collect()
    assert len(rows) == len(exact) > 0
    for r in rows:
        assert abs(r.est_users - exact[r.week]) / exact[r.week] < 0.05
        assert r.n_days >= 1


def test_cms_overestimate_bound(spark, sf_dir):
    """CMS estimates must satisfy exact <= est <= exact + eps*N
    (eps=0.001, conf=0.99) for every heavy-hitter candidate."""
    from pyspark_distributed_kmodes_spark.operators.sketches import qb40_cms_heavy_hitters

    rows = qb40_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.exact_n <= r.cms_n <= r.exact_n + 0.001 * r.n_total + 1, r
