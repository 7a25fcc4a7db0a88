"""K-modes property tests (SURVEY.md §5 layer 3): fixed-seed
determinism, cost sanity, cluster-count invariants, predict parity —
the non-SQL checks standing in for the hash oracle."""

import pytest
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.ml.kmodes import EnsembleKModes, KModes, KModesModel, hamming_distance_col
from pyspark_distributed_kmodes_spark.sources.tables import table

COLS = ("o_orderstatus", "o_orderpriority")


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return table(spark, sf_dir, "orders").select(*COLS).persist()


def test_hamming_distance_matches_python(spark):
    df = spark.createDataFrame([("a", "x"), ("a", "y"), ("b", "y")], ["c1", "c2"])
    d = df.select(hamming_distance_col(["c1", "c2"], ["a", "y"]).alias("d")).collect()
    assert [r.d for r in d] == [1, 0, 1]


def test_fixed_seed_determinism(orders):
    m1 = KModes(n_clusters=4, cols=COLS, max_iter=10, seed=11).fit(orders)
    m2 = KModes(n_clusters=4, cols=COLS, max_iter=10, seed=11).fit(orders)
    assert m1.modes == m2.modes
    assert m1.cost == m2.cost


def test_different_seeds_may_differ_but_run(orders):
    m = KModes(n_clusters=4, cols=COLS, max_iter=10, seed=99).fit(orders)
    assert len(m.modes) == 4


def test_k_clusters_and_assignment_total(orders):
    model = KModes(n_clusters=5, cols=COLS, max_iter=15, seed=42).fit(orders)
    assert len(model.modes) == 5
    assigned = model.transform(orders, "p")
    n = orders.count()
    assert assigned.count() == n
    preds = assigned.select("p").distinct().collect()
    assert all(0 <= r.p < 5 for r in preds)


def test_cost_not_worse_than_init(orders):
    """Lloyd iterations must not increase the objective vs the seeded
    init modes (cost monotonicity, reference fit() convergence loop).
    max_iter=0 returns the init modes themselves with their cost."""
    init_cost = KModes(n_clusters=5, cols=COLS, max_iter=0, seed=42).fit(orders).cost
    fitted = KModes(n_clusters=5, cols=COLS, max_iter=15, seed=42).fit(orders)
    assert fitted.cost <= init_cost


def test_transform_ties_break_to_lowest_index(spark):
    model = KModesModel(cols=("c1",), modes=[("a",), ("a",)])  # identical modes
    df = spark.createDataFrame([("a",), ("b",)], ["c1"])
    out = {r.c1: r.p for r in model.transform(df, "p").collect()}
    assert out == {"a": 0, "b": 0}


def test_ensemble_reference_parity_shape(orders):
    """Two-level ensemble (reference A6/A9): P×k partition modes,
    meta-clustered to k final modes; mean cost exposed."""
    est = EnsembleKModes(n_partitions=4, n_clusters=3, seed=42, cols=COLS)
    model = est.fit(orders)
    assert len(model.modes) == 3
    assert model.cost >= 0.0
    m2 = EnsembleKModes(n_partitions=4, n_clusters=3, seed=42, cols=COLS).fit(orders)
    assert model.modes == m2.modes  # deterministic


def test_distributed_path_matches_local_path(orders):
    """Forcing the distributed per-iteration Lloyd (COMBO_THRESHOLD=0)
    must converge to an equally-good clustering as the weighted-local
    path — same k, same cost-quality class. (Inits differ: xxhash64 vs
    blake2b seeded hash, so modes may differ; cost must be comparable
    and the invariants identical.)"""
    local_model = KModes(n_clusters=4, cols=COLS, max_iter=15, seed=3).fit(orders)

    est = KModes(n_clusters=4, cols=COLS, max_iter=15, seed=3)
    est.COMBO_THRESHOLD = 0  # force _fit_distributed
    dist_model = est.fit(orders)

    assert len(dist_model.modes) == 4
    assert dist_model.cost >= 0
    # both paths must reach the same objective neighborhood on this
    # low-cardinality data (15 combos; Lloyd converges to a local opt)
    assert abs(dist_model.cost - local_model.cost) / max(local_model.cost, 1) < 0.25
    # distributed path is also deterministic
    est2 = KModes(n_clusters=4, cols=COLS, max_iter=15, seed=3)
    est2.COMBO_THRESHOLD = 0
    assert est2.fit(orders).modes == dist_model.modes


def test_pyspark_ml_estimator_facade(orders):
    """KModes as a pyspark.ml Estimator: fit via the ml API, transform
    in a Pipeline-compatible way."""
    from pyspark.ml import Pipeline

    from pyspark_distributed_kmodes_spark.ml.kmodes import SparkKModes

    est = SparkKModes(k=4, inputCols=list(COLS), maxIter=10, seed=11)
    pipe_model = Pipeline(stages=[est]).fit(orders)
    out = pipe_model.transform(orders)
    assert "prediction" in out.columns
    preds = {r.prediction for r in out.select("prediction").distinct().collect()}
    assert preds <= set(range(4))
    assert len(pipe_model.stages[0].clusters) == 4


def test_cao_init_deterministic_and_spread():
    """Cao density init: no RNG, picks the densest point first, never
    repeats a center, and spreads across distinct values."""
    import numpy as np

    from pyspark_distributed_kmodes_spark.ml.kmodes import _cao_init

    arr = np.array(
        [["a", "x"]] * 5 + [["b", "y"]] * 3 + [["c", "z"]] * 2, dtype=object
    )
    c1 = _cao_init(arr, 3)
    c2 = _cao_init(arr, 3)
    assert (c1 == c2).all()  # deterministic
    assert tuple(c1[0]) == ("a", "x")  # densest point first
    assert len({tuple(r) for r in c1}) == 3  # three distinct centers
