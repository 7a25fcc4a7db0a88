"""Distributed PCA over embedding columns.

The fit is the canonical two-pass map-reduce: (1) a decimal-exact mean
vector (b08's per-position aggregate), (2) per-partition covariance
partials — each Arrow batch contributes ONE d×d float64 matrix via
numpy GEMM, so the shuffle carries `num_batches × d²` doubles no matter
how many rows the corpus has (the tree-aggregate shape that makes PCA
tractable at 100 TB; rows never pair with each other). The d×d
eigendecomposition runs on the driver (d is model width, 64 here —
schema-bounded, NOT data-bounded), and projection is a broadcast of the
component matrix folded per-row with zip_with in whole-stage codegen.

Eigenvectors are sign-normalized (largest-|coordinate| made positive)
so fits are comparable across runs; eigenvalue ORDER and subspaces are
deterministic, while float partials may differ in final ulps across
partitionings — hence the query is rows-only with tolerance-based
property tests (trace identity, component orthonormality, projected
variance == eigenvalue, monotone reconstruction error).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),  # Σx (d)
        T.StructField("ss", T.ArrayType(T.DoubleType())),  # Σ xxᵀ flattened (d²)
    ]
)


@dataclass
class PCAModel:
    mean: list[float]  # d
    components: list[list[float]]  # k rows of d (principal axes)
    eigenvalues: list[float]  # k, descending
    total_variance: float  # trace of covariance

    @property
    def k(self) -> int:
        return len(self.components)

    def explained_ratio(self) -> list[float]:
        tv = self.total_variance or 1.0
        return [ev / tv for ev in self.eigenvalues]

    def transform(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Append `pca` (array of k scores). Broadcast-free: the
        component matrix enters the plan as literals (driver-side data,
        k×d doubles) and each score is a zip_with fold — no shuffle, no
        Python."""
        v = F.transform(vec_col, lambda x: x.cast("double"))
        mean_arr = F.array(*[F.lit(m) for m in self.mean])
        centered = F.zip_with(v, mean_arr, lambda a, b: a - b)
        scores = []
        for comp in self.components:
            carr = F.array(*[F.lit(c) for c in comp])
            scores.append(
                F.aggregate(
                    F.zip_with(centered, carr, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
        return df.withColumn("pca", F.array(*scores))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {
                    "mean": self.mean,
                    "components": self.components,
                    "eigenvalues": self.eigenvalues,
                    "total_variance": self.total_variance,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "PCAModel":
        d = json.load(open(path))
        return cls(d["mean"], d["components"], d["eigenvalues"], d["total_variance"])


def pca_fit(df: DataFrame, k: int, vec_col: str = "embedding") -> PCAModel:
    """Two-pass distributed PCA fit (see module docstring for the
    scale argument). One job: partials are computed per Arrow batch and
    reduced on the driver (num_batches d×d matrices — kilobytes)."""
    vecs = df.select(F.transform(vec_col, lambda x: x.cast("double")).alias("v"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf["v"].to_numpy())  # rows × d
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "ss": [(x.T @ x).ravel().tolist()],
                }
            )

    parts = vecs.mapInPandas(partials, _PARTIAL_SCHEMA).collect()
    n = sum(p["n"] for p in parts)
    d = len(parts[0]["s"])
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for p in parts:
        s += np.array(p["s"])
        ss += np.array(p["ss"]).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)  # E[xxᵀ] − μμᵀ
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    eigenvalues = []
    for idx in order:
        vec = evecs[:, idx]
        if vec[np.argmax(np.abs(vec))] < 0:  # sign-normalize
            vec = -vec
        comps.append(vec.tolist())
        eigenvalues.append(float(max(evals[idx], 0.0)))
    return PCAModel(
        mean=mean.tolist(),
        components=comps,
        eigenvalues=eigenvalues,
        total_variance=float(np.trace(cov)),
    )
