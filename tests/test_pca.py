"""PCA (operators/pca.py): numpy-exact moments, low-rank recovery,
distance preservation vs random projection, partition invariance,
map-only plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.pca import pca_project, train_pca
from pinecone_datasets_spark.plans.explain import formatted_plan

DIM = 12


def _mat(spark, m):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(m)],
        "id long, values array<double>",
    )


@pytest.fixture(scope="module")
def aniso(spark):
    # anisotropic Gaussian: variance concentrated in 3 directions
    rng = np.random.default_rng(7)
    scales = np.array([10.0, 6.0, 3.0] + [0.1] * (DIM - 3))
    basis = np.linalg.qr(rng.normal(size=(DIM, DIM)))[0]
    m = (rng.normal(size=(400, DIM)) * scales) @ basis.T + 5.0
    return m, _mat(spark, m)


def test_components_match_numpy(spark, aniso):
    m, df = aniso
    comps, mean, ratio = train_pca(df, out_dim=3, vector_col="values")
    assert np.allclose(mean, m.mean(axis=0), atol=1e-9)
    cov = np.cov(m, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    want = evecs[:, np.argsort(evals)[::-1][:3]]
    # compare up to sign, column by column
    for j in range(3):
        dot = abs(float(want[:, j] @ comps[:, j]))
        assert dot == pytest.approx(1.0, abs=1e-6), (j, dot)
    assert ratio.shape == (3,) and ratio[0] >= ratio[1] >= ratio[2]


def test_low_rank_data_fully_explained(spark):
    rng = np.random.default_rng(0)
    basis = np.linalg.qr(rng.normal(size=(DIM, 3)))[0]
    m = rng.normal(size=(200, 3)) @ basis.T  # exactly rank 3
    _, _, ratio = train_pca(_mat(spark, m), out_dim=3)
    assert float(ratio.sum()) == pytest.approx(1.0, abs=1e-9)


def test_projection_centers_and_preserves_distance(spark, aniso):
    m, df = aniso
    comps, mean, ratio = train_pca(df, out_dim=3)
    rows = pca_project(df, comps, mean).orderBy("id").collect()
    proj = np.asarray([r["pca"] for r in rows])
    assert proj.shape == (len(m), 3)
    assert np.allclose(proj.mean(axis=0), 0.0, atol=1e-9)
    assert np.allclose(proj, (m - m.mean(axis=0)) @ comps, atol=1e-9)

    # PCA-3 must preserve pairwise distances of this anisotropic cloud
    # far better than a data-oblivious random 3-projection
    def dist_err(p):
        full = np.linalg.norm(m[:50, None] - m[None, :50], axis=2)
        red = np.linalg.norm(p[:50, None] - p[None, :50], axis=2)
        iu = np.triu_indices(50, 1)
        return float(np.abs(red[iu] - full[iu]).mean() / full[iu].mean())

    rng = np.random.default_rng(1)
    rp = (m - m.mean(axis=0)) @ np.linalg.qr(rng.normal(size=(DIM, 3)))[0]
    assert dist_err(proj) < 0.5 * dist_err(rp), (
        dist_err(proj),
        dist_err(rp),
    )


def test_partition_invariance(spark, aniso):
    _, df = aniso
    c1, m1, r1 = train_pca(df.repartition(1), out_dim=2)
    c7, m7, r7 = train_pca(df.repartition(7), out_dim=2)
    assert np.allclose(m1, m7, atol=1e-9)
    assert np.allclose(np.abs(c1.T @ c7), np.eye(2), atol=1e-6)
    assert np.allclose(r1, r7, atol=1e-9)


def test_project_plan_map_only(spark, aniso):
    _, df = aniso
    comps, mean, _ = train_pca(df, out_dim=3)
    plan = formatted_plan(pca_project(df, comps, mean))
    assert "Exchange" not in plan  # no shuffle: one Arrow stage
    assert "ArrowEvalPython" in plan


def test_guards(spark, aniso):
    _, df = aniso
    with pytest.raises(ValueError):
        train_pca(df, out_dim=0)
    with pytest.raises(ValueError):
        train_pca(df, out_dim=DIM + 1)
    with pytest.raises(ValueError):
        train_pca(df.limit(0), out_dim=2)


def test_no_center_mode(spark):
    rng = np.random.default_rng(3)
    m = rng.normal(size=(100, DIM)) + 2.0
    comps, mean, _ = train_pca(_mat(spark, m), out_dim=2, center=False)
    assert np.allclose(mean, 0.0)
    # uncentered: components diagonalize the raw second moment E[vv^T]
    sm = (m.T @ m) / len(m)
    evals, evecs = np.linalg.eigh(sm)
    want = evecs[:, np.argsort(evals)[::-1][:2]]
    for j in range(2):
        assert abs(float(want[:, j] @ comps[:, j])) == pytest.approx(
            1.0, abs=1e-6
        )


def test_opq_rotation_cuts_pq_error(spark):
    """On correlated anisotropic data the OPQ rotation (PCA +
    eigenvalue allocation) must cut PQ reconstruction error vs
    quantizing raw dimensions at the same (m, n_codes) budget."""
    from pinecone_datasets_spark.operators.pca import train_opq_rotation
    from pinecone_datasets_spark.operators.pq import train_pq_codebooks
    from pinecone_datasets_spark.operators.ivf import _nearest

    rng = np.random.default_rng(11)
    # strong cross-dimension correlation + skewed scales
    scales = np.geomspace(12.0, 0.2, DIM)
    mix = np.linalg.qr(rng.normal(size=(DIM, DIM)))[0]
    m = (rng.normal(size=(600, DIM)) * scales) @ mix.T
    df = _mat(spark, m)

    R, mu = train_opq_rotation(df, m=4)
    assert np.allclose(R @ R.T, np.eye(DIM), atol=1e-9)  # orthogonal

    def recon_err(mat, sub_df):
        books = train_pq_codebooks(sub_df, m=4, n_codes=16, seed=3)
        dsub = DIM // 4
        err = 0.0
        for j in range(4):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            codes = _nearest(sub, books[j])
            err += float(((sub - books[j][codes]) ** 2).sum())
        return err

    raw = recon_err(m, df)
    rot_mat = (m - mu) @ R
    rotated = recon_err(rot_mat, _mat(spark, rot_mat))
    assert rotated < 0.8 * raw, (rotated, raw)


def test_opq_rotation_preserves_distances(spark, aniso):
    from pinecone_datasets_spark.operators.pca import train_opq_rotation

    m, df = aniso
    R, mu = train_opq_rotation(df, m=3)
    c = m - mu
    rot = c @ R
    # full-rank orthogonal map: pairwise L2 and dot of centered
    # vectors are invariant -> ADC ranking over rotated space is exact
    g_raw = c[:30] @ c[:30].T
    g_rot = rot[:30] @ rot[:30].T
    assert np.allclose(g_raw, g_rot, atol=1e-8)


def test_opq_guards(spark, aniso):
    from pinecone_datasets_spark.operators.pca import train_opq_rotation

    _, df = aniso
    with pytest.raises(ValueError):
        train_opq_rotation(df, m=5)  # DIM=12 not divisible by 5
