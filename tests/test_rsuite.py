"""Independent re-derivations for the round-10 staged r-suite (new
engine surface, operators/analytics12.py): a Python replay of the SQL
scripting fold, a Python json re-extraction for the Variant key, and
an XML round-trip identity pin that includes escaping-hostile strings.

The r-prefix sorts after every q* key, so these stay OUT of the
round-10 driver window (pinned in test_entry.py) and rename into
o-space for round 11 per the documented plan."""

from collections import defaultdict

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_r01_matches_python_fold(spark, sf_dir, reg, duck):
    """Replay the scripting FOR/IF fold in plain Python over the same
    grouped counts — iteration order, variable updates, and the
    integer above-average branch must all agree."""
    row = reg["r01_sql_scripting_controlflow"].fn(spark, sf_dir).collect()[0]
    counts = duck.execute(
        "SELECT o_orderpriority, COUNT(*) FROM orders GROUP BY 1 ORDER BY 1"
    ).fetchall()
    ngrp, tot = len(counts), sum(c for _, c in counts)
    wsum = sum(rnk * c for rnk, (_, c) in enumerate(counts, start=1))
    n_hi = sum(1 for _, c in counts if c * ngrp > tot)
    assert (row.n_groups, row.rank_weighted_count, row.n_above_avg, row.n_orders) == (
        ngrp,
        wsum,
        n_hi,
        tot,
    )


def test_r01_scripting_while_loop(spark):
    """Breadth pin for the scripting executor beyond FOR/IF: WHILE with
    a data-independent closed form (sum of squares below 10)."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    r = spark.sql(
        """
        BEGIN
          DECLARE i INT DEFAULT 0;
          DECLARE acc BIGINT DEFAULT 0;
          WHILE i < 10 DO
            SET acc = acc + i * i;
            SET i = i + 1;
          END WHILE;
          SELECT acc AS v;
        END
        """
    ).collect()
    assert r[0].v == sum(i * i for i in range(10))


def test_r02_matches_python_json(spark, sf_dir, reg, duck):
    rows = reg["r02_variant_json_extraction"].fn(spark, sf_dir).collect()
    import json

    per = defaultdict(lambda: [0, 0, 0])
    for et, props in duck.execute("SELECT event_type, props FROM events").fetchall():
        k = json.loads(props)["k"]
        per[et][0] += 1
        per[et][1] += k
        per[et][2] += 1 if 25 <= k <= 75 else 0
    assert {r.event_type: (r.n_events, r.sum_k, r.n_mid_k) for r in rows} == {
        et: tuple(v) for et, v in per.items()
    }


def test_r02_variant_typed_null_path(spark):
    """try_variant_get on a missing path must be NULL, and variant_get
    with an explicit type must return that type — the two behaviors the
    oracle twin cannot distinguish from string extraction."""
    r = spark.sql(
        """
        SELECT try_variant_get(parse_json('{"k": 5}'), '$.missing', 'bigint') AS miss,
               variant_get(parse_json('{"k": 5}'), '$.k', 'bigint') AS k
        """
    ).collect()[0]
    assert r.miss is None and r.k == 5
    schema = spark.sql(
        "SELECT variant_get(parse_json('{\"k\": 5}'), '$.k', 'bigint') AS k"
    ).schema
    assert schema["k"].dataType.simpleString() == "bigint"


def test_r03_matches_raw_aggregate(spark, sf_dir, reg, duck):
    rows = reg["r03_xml_expression_roundtrip"].fn(spark, sf_dir).collect()
    expect = {
        et: (n, su, se)
        for et, n, su, se in duck.execute(
            "SELECT event_type, COUNT(*), SUM(user_id), SUM(event_id) "
            "FROM events GROUP BY 1"
        ).fetchall()
    }
    assert {r.event_type: (r.n_events, r.sum_user, r.sum_event_id) for r in rows} == expect


def test_r03_xml_roundtrip_escaping(spark):
    """The round-trip must survive XML-hostile strings (angle brackets,
    ampersands, quotes) — the failure mode the aggregate twin would
    only catch if the testdata happened to contain them."""
    hostile = ["a<b&c", 'q"u\'o', "tag</t>", "plain", "x&amp;y"]
    df = spark.createDataFrame([(s, i) for i, s in enumerate(hostile)], "s string, i long")
    out = df.selectExpr(
        "from_xml(to_xml(named_struct('s', s, 'i', i)), 's STRING, i BIGINT') AS x"
    ).select("x.s", "x.i")
    assert sorted((r.s, r.i) for r in out.collect()) == sorted(
        (s, i) for i, s in enumerate(hostile)
    )


def test_r_keys_sort_outside_window(reg):
    """Staging guard: every r-key must sort after every q* key so the
    round-10 window (first 50 sorted) cannot contain one."""
    keys = sorted(reg)
    r_keys = [k for k in keys if k.startswith("r0")]
    assert r_keys, "r-suite must be registered"
    first50 = set(keys[:50])
    assert not (set(r_keys) & first50)
    assert all(k > max(q for q in keys if q.startswith("q")) for k in r_keys)
