"""m22-style SEMANTIC invariants for the oldest q-suite (q01-q50, the
round-1 rows re-certified in the round-10 window). The hash oracle
proves Spark == DuckDB on the same statement; these tests pin what the
hash provably cannot: sign/direction/bound/algebraic identities derived
from FIRST PRINCIPLES (and cross-QUERY identities like semi+anti
partitioning), so a both-engines-wrong reading of the spec breaks here
even when the two engines agree with each other.

Verdict r09 item #5: ≥10 of the oldest keys covered — this file covers
q01, q05+q06, q10, q11, q14, q20, q21, q22, q25+q26+q27, q30, q33,
q48, q50 (15 keys).
"""

from collections import defaultdict
from datetime import datetime, time as dtime

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_q01_pricing_identities(spark, sf_dir, reg):
    """avg*count == sum for qty; discount in [0,1) forces
    disc_price <= base_price; nonnegative tax forces charge >= disc."""
    for r in reg["q01_pricing_summary"].fn(spark, sf_dir).collect():
        assert r.count_order > 0
        assert abs(r.avg_qty * r.count_order - r.sum_qty) < 1e-6 * max(1.0, r.sum_qty)
        assert 0.0 <= r.avg_disc < 1.0
        assert r.sum_disc_price <= r.sum_base_price + 1e-6
        assert r.sum_charge >= r.sum_disc_price - 1e-6


def test_q05_q06_partition_all_customers(spark, sf_dir, reg, duck):
    """Cross-query identity: semi-join actives + anti-join inactives
    partition the customer table exactly."""
    active = sum(
        r.n_active_customers for r in reg["q05_semi_join"].fn(spark, sf_dir).collect()
    )
    inactive = reg["q06_anti_join"].fn(spark, sf_dir).count()
    total = duck.execute("SELECT COUNT(*) FROM customer").fetchone()[0]
    assert active + inactive == total


def test_q10_agg_family_bounds(spark, sf_dir, reg):
    """count >= count-distinct, min <= max, listagg cardinality equals
    the row count, and the argmin/argmax names appear in the list."""
    for r in reg["q10_agg_family"].fn(spark, sf_dir).collect():
        assert r.n_rows >= r.n_nations > 0
        assert r.min_bal <= r.max_bal
        names = r.all_names.split(",")
        assert len(names) == r.n_rows
        assert r.poorest in names and r.richest in names


def test_q11_rollup_subtotals_consistent(spark, sf_dir, reg):
    """Each region's ALL row must equal the sum of its nation rows —
    the rollup lattice identity."""
    rows = reg["q11_rollup"].fn(spark, sf_dir).collect()
    per_region = defaultdict(lambda: [0, 0.0])
    totals = {}
    for r in rows:
        if r.region_name == "ALL":
            continue
        if r.nation_name == "ALL":
            totals[r.region_name] = (r.n_customers, r.total_bal)
        else:
            per_region[r.region_name][0] += r.n_customers
            per_region[r.region_name][1] += r.total_bal
    assert totals, "rollup must emit per-region subtotal rows"
    for region, (n, bal) in totals.items():
        assert n == per_region[region][0]
        assert abs(bal - per_region[region][1]) < 1e-4


def test_q14_percentiles_ordered(spark, sf_dir, reg, duck):
    """p25 <= p75, and the median quantity sits inside the group's
    true [min, max] from an independent scan."""
    bounds = {
        f: (lo, hi)
        for f, lo, hi in duck.execute(
            "SELECT l_returnflag, MIN(l_quantity), MAX(l_quantity) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    for r in reg["q14_percentiles"].fn(spark, sf_dir).collect():
        assert r.p25_price <= r.p75_price
        lo, hi = bounds[r.l_returnflag]
        assert lo <= r.med_qty <= hi


def test_q20_rank_family_laws(spark, sf_dir, reg):
    """Per partition: row_number is a permutation 1..n, rank >= dense
    rank, rank never exceeds row_number, pct_rank in [0,1] and 0 for
    the first row."""
    per = defaultdict(list)
    for r in reg["q20_rank_family"].fn(spark, sf_dir).collect():
        per[r.o_orderstatus].append(r)
    for rows in per.values():
        rows.sort(key=lambda r: r.rn)
        assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
        for r in rows:
            assert r.drnk <= r.rnk <= r.rn
            assert 0.0 <= r.pct_rank <= 1.0
        assert rows[0].pct_rank == 0.0
        # price ordering is what the window sorts on: nonincreasing
        prices = [r.o_totalprice for r in rows]
        assert all(a >= b for a, b in zip(prices, prices[1:]))


def test_q21_running_total_is_prefix_sum(spark, sf_dir, reg):
    """Recompute the per-user running total and 3-row moving sum from
    the row sequence itself — the frame arithmetic under the law."""
    per = defaultdict(list)
    for r in reg["q21_lag_lead_running"].fn(spark, sf_dir).collect():
        per[r.user_id].append(r)
    assert per
    for rows in per.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        acc = 0.0
        vals = []
        for r in rows:
            acc += r.value
            vals.append(r.value)
            assert abs(r.running_total - acc) < 1e-6
            assert abs(r.moving_sum3 - sum(vals[-3:])) < 1e-6
        for prev, cur, nxt in zip([None] + rows[:-1], rows, rows[1:] + [None]):
            assert cur.prev_value == (prev.value if prev else None)
            assert cur.next_value == (nxt.value if nxt else None)


def test_q22_topk_is_group_maxima(spark, sf_dir, reg, duck):
    """Each group returns <= k rows, ranks 1..k consecutive, prices
    nonincreasing, and row 1 is the group's true maximum."""
    true_max = dict(
        duck.execute(
            "SELECT o_orderpriority, MAX(o_totalprice) FROM orders GROUP BY 1"
        ).fetchall()
    )
    per = defaultdict(list)
    for r in reg["q22_topk_per_group"].fn(spark, sf_dir).collect():
        per[r.o_orderpriority].append(r)
    for pr, rows in per.items():
        rows.sort(key=lambda r: r.rn)
        assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
        prices = [r.o_totalprice for r in rows]
        assert all(a >= b for a, b in zip(prices, prices[1:]))
        assert prices[0] == true_max[pr]


def test_q25_q26_q27_set_algebra(spark, sf_dir, reg):
    """Cross-query set identities: intersect and except are disjoint,
    both are subsets of the union, and |except| + |intersect| <= |union|."""
    union = {r.nationkey for r in reg["q25_union_distinct"].fn(spark, sf_dir).collect()}
    inter = {r.nationkey for r in reg["q26_intersect"].fn(spark, sf_dir).collect()}
    exc = {r.nationkey for r in reg["q27_except"].fn(spark, sf_dir).collect()}
    assert inter <= union and exc <= union
    assert not (inter & exc)
    assert len(inter) + len(exc) <= len(union)


def test_q30_windows_tile_the_stream(spark, sf_dir, reg, duck):
    """Tumbling windows must tile: hour-aligned, exactly 1h wide, and
    the per-window counts sum to the table's row count."""
    rows = reg["q30_tumbling_window"].fn(spark, sf_dir).collect()
    total = duck.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert sum(r.n_events for r in rows) == total
    for r in rows:
        assert (r.window_end - r.window_start).total_seconds() == 3600.0
        assert r.window_start.minute == 0 and r.window_start.second == 0


def test_q33_asof_picks_latest_past_order(spark, sf_dir, reg, duck):
    """Re-derive the as-of semantics row by row: the matched order is
    the LATEST order of that user at or before the event time, ties on
    date resolved to the highest orderkey."""
    orders = defaultdict(list)
    for ck, od, ok, tp in duck.execute(
        "SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM orders"
    ).fetchall():
        orders[ck].append((datetime.combine(od, dtime.min), ok, tp))
    for v in orders.values():
        v.sort()
    checked = 0
    for r in reg["q33_asof_join"].fn(spark, sf_dir).collect():
        past = [o for o in orders.get(r.user_id, []) if o[0] <= r.ts]
        if r.last_orderkey is None:
            assert not past
            continue
        assert past, r
        best_ts = max(o[0] for o in past)
        best = max(o for o in past if o[0] == best_ts)  # highest orderkey on tie
        assert (r.last_orderkey, r.last_totalprice) == (best[1], best[2]), r
        checked += 1
    assert checked > 0


def test_qo48_try_arithmetic_null_contract(spark, sf_dir, reg):
    """try_divide is NULL exactly when the divisor is zero; the
    impossible cast is always NULL; k is nonnegative."""
    for r in reg["qo48_try_arithmetic"].fn(spark, sf_dir).collect():
        assert r.bad_cast is None
        assert r.k_int >= 0
        assert (r.per_k is None) == (r.k_int == 0)


def test_qo50_word_count_positive_and_sorted(spark, sf_dir, reg):
    rows = reg["qo50_word_count"].fn(spark, sf_dir).collect()
    assert rows
    counts = [r.n for r in rows]
    assert all(c > 0 for c in counts)
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert len({r.word for r in rows}) == len(rows)
