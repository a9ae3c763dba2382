"""Distributed PCA / whitening for embedding columns.

The 100-TB embedding workflows (dedup, ANN, clustering — this repo's
operators/similarity.py) routinely want a decorrelated, reduced basis
first: PCA cuts ADC/cosine cost and whitening is the standard
preprocessing for OPQ and for embedding-similarity calibration.

Spark-first shape — the textbook one-pass moment aggregation:

  1. each partition accumulates (n, Σx, ΣxxT) in ONE numpy pass
     (`mapInPandas` over Arrow batches; the Gram update is a single
     d×B @ B×d matmul per batch);
  2. partials are tiny ((d²+d+1) doubles — 33 KB at d=64, 8 MB at
     d=1024) and are summed driver-side: the collect is bounded by the
     PARTITION count, not the row count — the same bounded-collect
     contract as the sketch tree-merges;
  3. eigendecomposition of the d×d covariance runs on the driver
     (numpy `eigh`; d ≤ a few thousand — never row-scale);
  4. projection/whitening broadcasts the (d×k) basis back and applies
     one matmul per Arrow batch.

Numerical note: covariance = E[xxT] − μμT over the float64 sums; the
driver gate checks entries to 4 decimals against an exact SQL oracle,
and eigenvectors' SIGNS are canonicalized (largest-|component| positive)
so results are deterministic across partition orders.

Reference scope note: armon/hlld has no linear algebra; LLM-pipeline
layer companion to operators/similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType


def embedding_moments(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass → (n, mean (d,), covariance (d,d)) in
    float64. The only driver traffic is one partial per partition."""
    def partials(batches):
        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            if s is None:
                s = x.sum(axis=0)
                g = x.T @ x
            else:
                s += x.sum(axis=0)
                g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "sums": [np.concatenate([s, g.ravel()]).astype(np.float64)]}
            )

    from pyspark.sql.types import DoubleType, LongType

    # partials travel as float64 arrays (ArrayType(DoubleType))
    schema = StructType(
        [
            StructField("n", LongType(), False),
            StructField("sums", ArrayType(DoubleType(), False), False),
        ]
    )
    rows = df.select(vec_col).mapInPandas(partials, schema=schema).collect()
    if not rows:
        raise ValueError("no embeddings")
    n = sum(r["n"] for r in rows)
    acc = np.zeros(len(rows[0]["sums"]))
    for r in rows:
        acc += np.asarray(r["sums"])
    d = int((-1 + np.sqrt(1 + 4 * len(acc))) / 2)
    s, g = acc[:d], acc[d:].reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return n, mean, cov


def fit_pca(
    df: DataFrame, vec_col: str = "embedding", k: int | None = None
) -> dict:
    """Distributed-moments PCA fit → {mean, components (k,d),
    eigvals (k,), total_var}. Components are sorted by descending
    eigenvalue with deterministic sign (largest-|entry| positive)."""
    n, mean, cov = embedding_moments(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    if k is not None:
        vals, vecs = vals[:k], vecs[:, :k]
    # canonical signs: the largest-|component| entry of each vector > 0
    flip = np.sign(vecs[np.abs(vecs).argmax(axis=0), np.arange(vecs.shape[1])])
    flip[flip == 0] = 1.0
    vecs = vecs * flip
    return {
        "n": n,
        "mean": mean,
        "components": vecs.T,
        "eigvals": np.maximum(vals, 0.0),
        "total_var": float(np.trace(cov)),
    }


def with_reconstruction_sq_error(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    proj_col: str = "pca",
    out_col: str = "recon_sq_error",
) -> DataFrame:
    """Per-row squared reconstruction error ‖x − (y·C + μ)‖² — the
    distributed check that the projection/basis round-trips: its MEAN
    equals the dropped eigenvalue mass exactly (PCA optimality)."""
    comps = model["components"].astype(np.float64)
    mean = model["mean"].astype(np.float64)

    @F.pandas_udf("double")
    def _err(orig: pd.Series, p: pd.Series) -> pd.Series:
        x = np.stack(orig.to_numpy()).astype(np.float64)
        y = np.stack(p.to_numpy()).astype(np.float64)
        recon = y @ comps + mean
        return pd.Series(((x - recon) ** 2).sum(axis=1))

    return df.withColumn(out_col, _err(F.col(vec_col), F.col(proj_col)))


def project_embeddings(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project (and optionally whiten) the embedding column onto the
    fitted basis — one matmul per Arrow batch, basis shipped once as a
    closure constant (same contract as the PQ distance tables)."""
    comps = model["components"].astype(np.float64)
    mean = model["mean"].astype(np.float64)
    scale = (
        1.0 / np.sqrt(np.maximum(model["eigvals"], 0.0) + eps)
        if whiten
        else np.ones(len(model["eigvals"]))
    )

    @F.pandas_udf(ArrayType(FloatType()))
    def _proj(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64)
        y = (x - mean) @ comps.T * scale
        return pd.Series(list(y.astype(np.float32)))

    return df.withColumn(out_col, _proj(F.col(vec_col)))
