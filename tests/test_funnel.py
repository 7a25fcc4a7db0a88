"""Ordering semantics of the z09 event funnel: stage events count only
when STRICTLY after the previous stage's entry time."""

import datetime
import unittest.mock as mock


def _ev(uid, etype, minute):
    return (uid, etype, datetime.datetime(2024, 1, 1, 10, minute))


def test_funnel_requires_strict_order(spark):
    from pyspark_distributed_kmodes_spark.operators import events as m

    rows = [
        # u1: full ordered funnel
        _ev(1, "view", 0),
        _ev(1, "click", 5),
        _ev(1, "purchase", 9),
        # u2: click BEFORE first view -> stops at view
        _ev(2, "click", 0),
        _ev(2, "view", 5),
        _ev(2, "purchase", 9),
        # u3: purchase before click -> stops at click
        _ev(3, "view", 0),
        _ev(3, "purchase", 2),
        _ev(3, "click", 5),
        # u4: never viewed -> not in funnel at all
        _ev(4, "click", 1),
        _ev(4, "purchase", 2),
        # u5: click at the SAME minute as view -> strict > excludes it
        _ev(5, "view", 3),
        _ev(5, "click", 3),
    ]
    d = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    with mock.patch.object(m, "table", lambda spark, sf, name: d):
        got = {r.stage: (r.event_type, r.n_users) for r in m.qe09_event_funnel(spark, "x").collect()}
    assert got[1] == ("view", 4)  # u1 u2 u3 u5
    assert got[2] == ("click", 2)  # u1 (5>0), u3 (5>0); u2's click too early, u5 tie
    assert got[3] == ("purchase", 1)  # u1 only (u3's purchase precedes click)
