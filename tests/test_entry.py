"""Driver-contract smoke tests (SURVEY.md §5 layer 1)."""

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns and "count_order" in df.columns


def test_every_oracle_key_has_a_query():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 50


def test_queries_are_callables():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name


def test_driver_window_is_the_staged_suite():
    """The driver's CORRECTNESS file covers the first 50 keys in sorted
    order; the rotation scheme (__spark_entry__.py docstring) promises
    that window is exactly the never-driver-checked staged suite. Pin
    it so a mis-rotation (a key accidentally sorting into/out of the
    window) fails mechanically instead of wasting a driver round.
    Round 10: the window is exactly n01-n08 + q01-q42 — the staged
    n-suite first, then re-certification of the oldest round-1 rows
    (q43-q50 re-certify in round 11). Round-11 staging (r-prefix)
    must sort AFTER every q* key so it cannot leak into this window."""
    import __spark_entry__ as entrymod

    window = sorted(entrymod.queries())[:50]
    n_keys = [k for k in window if k.startswith("n")]
    q_keys = [k for k in window if k.startswith("q") and k[1].isdigit()]
    assert len(n_keys) + len(q_keys) == 50, [
        k for k in window if k not in n_keys and k not in q_keys
    ]
    assert sorted(int(k[1:3]) for k in n_keys) == list(range(1, 9))
    assert sorted(int(k[1:3]) for k in q_keys) == list(range(1, 43))
