"""Distributed PCA (operators/embeddings.py) vs direct numpy on the
same vectors: moments exact to float64 roundoff, spectral invariants,
whitening, and partition-order invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hlld_spark.operators.embeddings import (
    embedding_moments,
    fit_pca,
    project_embeddings,
)


def _mk(spark, n=400, d=16, seed=3, parts=7):
    rng = np.random.default_rng(seed)
    # anisotropic: a few dominant directions
    basis = rng.normal(size=(d, d))
    scales = np.linspace(3.0, 0.1, d)
    x = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d)
    rows = [(i, x[i].astype(np.float32).tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(parts)
    return df, np.stack([np.array(r[1], dtype=np.float64) for r in rows])


@pytest.mark.spark
def test_moments_match_numpy(spark):
    df, x = _mk(spark)
    n, mean, cov = embedding_moments(df)
    assert n == len(x)
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), rtol=1e-7, atol=1e-7)


@pytest.mark.spark
def test_partition_order_invariance(spark):
    df, _ = _mk(spark, parts=3)
    m1 = fit_pca(df, k=5)
    m2 = fit_pca(df.repartition(13), k=5)
    np.testing.assert_allclose(m1["eigvals"], m2["eigvals"], rtol=1e-8)
    np.testing.assert_allclose(m1["components"], m2["components"], rtol=1e-6, atol=1e-8)


@pytest.mark.spark
def test_pca_spectral_invariants(spark):
    df, x = _mk(spark)
    k = 6
    model = fit_pca(df, k=k)
    # orthonormal basis
    np.testing.assert_allclose(
        model["components"] @ model["components"].T, np.eye(k), atol=1e-8
    )
    # projected variance per component = eigenvalue; reconstruction MSE
    # = sum of dropped eigenvalues
    proj = project_embeddings(df, model)
    y = np.stack([
        np.array(r["pca"], dtype=np.float64)
        for r in proj.orderBy("vec_id").collect()
    ])
    np.testing.assert_allclose(y.var(axis=0), model["eigvals"], rtol=1e-4)
    recon = (y @ model["components"]) + model["mean"]
    mse = ((x - recon) ** 2).sum(axis=1).mean()
    dropped = model["total_var"] - model["eigvals"].sum()
    assert mse == pytest.approx(dropped, rel=1e-4)


@pytest.mark.spark
def test_whitening_gives_identity_covariance(spark):
    df, _ = _mk(spark)
    model = fit_pca(df, k=8)
    w = project_embeddings(df, model, whiten=True)
    y = np.stack([np.array(r["pca"], dtype=np.float64) for r in w.collect()])
    np.testing.assert_allclose(np.cov(y.T, bias=True), np.eye(8), atol=1e-3)


def _blob_data(spark, n_per=60, k=4, d=8, seed=5, parts=6):
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=10.0, size=(k, d))
    pts = np.concatenate(
        [centers[j] + rng.normal(scale=0.3, size=(n_per, d)) for j in range(k)]
    )
    rows = [(i, pts[i].astype("float32").tolist()) for i in range(len(pts))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(parts)
    return df, pts, centers


@pytest.mark.spark
def test_kmeans_recovers_blobs(spark):
    from hlld_spark.operators.embeddings import kmeans_assign, kmeans_fit

    df, pts, centers = _blob_data(spark)
    model = kmeans_fit(df, k=4)
    assert model["converged"]
    # every true center has a fitted centroid within a fraction of the
    # inter-center distance
    import numpy as np

    for c in centers:
        assert np.abs(model["centroids"] - c).sum(axis=1).min() < 1.5
    out = kmeans_assign(df, model)
    rows = out.collect()
    # points generated from the same blob land in the same cluster
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r["vec_id"] // 60, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_blob.values())
    # inertia equals the sum of assigned sq dists
    total = sum(r["cluster_sq_dist"] for r in rows)
    assert total == pytest.approx(model["inertia"], rel=1e-6)


@pytest.mark.spark
def test_kmeans_partition_invariance(spark):
    from hlld_spark.operators.embeddings import kmeans_fit
    import numpy as np

    df, _, _ = _blob_data(spark, parts=3)
    m1 = kmeans_fit(df, k=4)
    m2 = kmeans_fit(df.repartition(11), k=4)
    np.testing.assert_allclose(m1["centroids"], m2["centroids"], rtol=1e-9, atol=1e-9)


@pytest.mark.spark
def test_kmeans_centroids_are_cluster_means(spark):
    """Cross-check the mapInPandas partials against a pure-Catalyst
    explode/groupBy mean of the final assignment."""
    from hlld_spark.operators.embeddings import kmeans_assign, kmeans_fit
    import numpy as np

    df, _, _ = _blob_data(spark)
    model = kmeans_fit(df, k=4)
    assigned = kmeans_assign(df, model)
    means = (
        assigned.select("cluster", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("cluster", "dim")
        .agg(F.avg("val").alias("m"))
        .collect()
    )
    for r in means:
        assert model["centroids"][r["cluster"], r["dim"]] == pytest.approx(
            r["m"], abs=1e-5
        )
