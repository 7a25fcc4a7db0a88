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
    Round 9: the window is exactly l01-l14 + m01-m35 + m58."""
    import __spark_entry__ as entrymod

    window = sorted(entrymod.queries())[:50]
    l_keys = [k for k in window if k.startswith("l")]
    m_keys = [k for k in window if k.startswith("m")]
    assert len(l_keys) + len(m_keys) == 50, [
        k for k in window if not k.startswith(("l", "m"))
    ]
    assert sorted(int(k[1:3]) for k in l_keys) == list(range(1, 15))
    assert sorted(int(k[1:3]) for k in m_keys) == list(range(1, 36)) + [58]
