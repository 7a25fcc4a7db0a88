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
    Round 11: the window is exactly the 50 o-keys — o01-o26 (the
    round-10 staged r-suite, renamed), o43-o50 (q43-q50 re-certs),
    and o51-o57 + o59-o67 (the oldest round-2 rows, renamed; q58
    already re-certified as qm58 in round 9). Round-12 staging
    (p-prefix) sorts after o67 and before q01, outside this window."""
    import __spark_entry__ as entrymod

    window = sorted(entrymod.queries())[:50]
    o_keys = [k for k in window if k.startswith("o") and k[1].isdigit()]
    assert len(o_keys) == 50, [k for k in window if k not in o_keys]
    nums = sorted(int(k[1:3]) for k in o_keys)
    assert nums == list(range(1, 27)) + list(range(43, 58)) + list(range(59, 68))
