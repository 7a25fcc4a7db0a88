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
