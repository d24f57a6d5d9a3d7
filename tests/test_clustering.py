"""Distributed k-means (operators/clustering.py).

Correctness layers:
* exact agreement with a single-process numpy Lloyd reference (same
  deterministic init, same tie rule) — the distributed partial-sum
  machinery changes nothing but summation order;
* partitioning invariance (repartition(1) vs repartition(7));
* empty-cell handling (duplicate init centroids -> lowest cell wins
  ties, the other keeps its previous centroid);
* spherical mode renormalizes.
The driver-level hash gate is the kmeans_cells contract oracle.
"""

import numpy as np
import pytest

from sketch_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_init_min_ids,
)


def _numpy_lloyd(mat, cents, iters):
    cents = cents.copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 8)) * 3.0
    rows = []
    for i in range(240):
        c = i % 4
        v = centers[c] + rng.normal(size=8) * 0.4
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _mat(emb_df):
    rows = sorted(emb_df.collect(), key=lambda r: r["vec_id"])
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_kmeans_fit_matches_numpy_lloyd(spark, emb_df):
    mat = _mat(emb_df)
    init = kmeans_init_min_ids(emb_df, 4)
    np.testing.assert_allclose(init, mat[:4])
    got = kmeans_fit(emb_df, k=4, iters=3)
    want = _numpy_lloyd(mat, mat[:4].copy(), 3)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_kmeans_fit_partitioning_invariant(spark, emb_df):
    a = kmeans_fit(emb_df.repartition(1), k=4, iters=2)
    b = kmeans_fit(emb_df.repartition(7), k=4, iters=2)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_kmeans_assign_matches_numpy(spark, emb_df):
    mat = _mat(emb_df)
    cents = kmeans_fit(emb_df, k=4, iters=2)
    rows = kmeans_assign(emb_df, cents, with_dist=True).collect()
    got = {r["vec_id"]: (r["cell"], r["sqdist"]) for r in rows}
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    want = np.argmin(d, axis=1)
    assert len(got) == len(mat)
    for i in range(len(mat)):
        assert got[i][0] == want[i]
        assert got[i][1] == pytest.approx(d[i, want[i]], abs=1e-9)


def test_kmeans_empty_cell_keeps_previous_centroid(spark, emb_df):
    mat = _mat(emb_df)
    # duplicate init: every point ties between cells 0 and 1; the lowest
    # cell wins, so cell 1 stays empty and must keep its init centroid
    init = np.stack([mat[0], mat[0], mat[1]])
    got = kmeans_fit(emb_df, iters=1, init=init)
    np.testing.assert_allclose(got[1], mat[0], atol=0)
    d = ((mat[:, None, :] - init[None, :, :]) ** 2).sum(axis=2)
    assign = np.argmin(d, axis=1)
    assert not (assign == 1).any()
    np.testing.assert_allclose(got[0], mat[assign == 0].mean(axis=0), atol=1e-9)


def test_kmeans_spherical_unit_norms(spark, emb_df):
    got = kmeans_fit(emb_df, k=4, iters=2, spherical=True)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-12)


def test_kmeans_spherical_is_cosine_kmeans(spark, emb_df):
    """spherical=True must L2-normalize inputs executor-side: the fit
    equals a numpy spherical-Lloyd run on pre-normalized vectors."""
    mat = _mat(emb_df)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cents = unit[:4].copy()
    for _ in range(2):
        assign = np.argmax(unit @ cents.T, axis=1)  # == argmin L2 on the sphere
        for c in range(4):
            members = unit[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    got = kmeans_fit(emb_df, k=4, iters=2, spherical=True)
    np.testing.assert_allclose(got, cents, atol=1e-9)


def test_ann_index_full_train_matches_unindexed(spark, sf001, tmp_path):
    """build_ann_index(train='full') probes must equal ivf_topk run with
    the SAME distributed-kmeans centroids — full-corpus training is a
    quantizer swap, not a semantics change."""
    import os

    from pyspark.sql import functions as F

    from sketch_spark.operators.similarity import (
        build_ann_index,
        ivf_topk,
        ivf_topk_indexed,
        load_ann_centroids,
    )

    emb = spark.read.parquet(os.path.join(sf001, "embeddings.parquet"))
    qrows = emb.filter(F.col("vec_id") < 5).collect()
    queries = {int(r["vec_id"]): r["embedding"] for r in qrows}
    corpus = emb.filter(F.col("vec_id") >= 10)
    path = str(tmp_path / "ivf_full")
    cents = build_ann_index(corpus, path, n_cells=8, kind="ivf", train="full")
    np.testing.assert_allclose(
        cents, kmeans_fit(corpus, k=8, iters=8, spherical=True), atol=1e-9
    )
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-12)
    assert np.allclose(load_ann_centroids(path), cents)
    got = sorted(
        tuple(r) for r in ivf_topk_indexed(spark, path, queries, k=5, nprobe=4).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivf_topk(
            corpus, queries, k=5, nprobe=4, centroids=cents
        ).collect()
    )
    assert got == want and len(got) == 25
