"""Tests for the localized SSM (shape_model/lssm.py), correspondence
generation (shape_model/correspondences.py) and plane fitting
(postprocess/plane_fitting.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fissure_segmentation_tpu.shape_model import (fit_lssm, fit_ssm,
                                                  generate_corresponding_points,
                                                  load_corresponding_points,
                                                  save_corresponding_points,
                                                  ssm_decode, ssm_project)
from fissure_segmentation_tpu.postprocess.plane_fitting import (
    fit_plane_to_fissure, plane_from_points_lstsq, plane_to_mesh)


def _shape_population(n=14, p=120, seed=0):
    """Random population: ellipse-ish sheet + low-rank global modes + a
    spatially local bump (which global PCA needs many modes to explain)."""
    rng = np.random.default_rng(seed)
    u = rng.uniform(-1, 1, (p, 2))
    base = np.concatenate([u, (0.3 * u[:, :1] ** 2)], axis=1)  # (P, 3)
    modes = rng.normal(0, 1, (2, p, 3)) * 0.05
    shapes = []
    for i in range(n):
        w = rng.normal(0, 1, 2)
        s = base + (w[:, None, None] * modes).sum(0)
        # local bump near u=(0.5, 0.5)
        d2 = ((u - [0.5, 0.5]) ** 2).sum(1)
        s[:, 2] += rng.normal(0, 1) * 0.08 * np.exp(-d2 / 0.05)
        shapes.append(s)
    return np.asarray(shapes, np.float32)


def test_lssm_fit_and_roundtrip():
    shapes = _shape_population()
    lssm = fit_lssm(shapes, num_levels=3, target_variance=0.97)
    assert lssm.eigenvectors.shape[1] == shapes.shape[1] * 3
    # basis is orthonormal
    q = np.asarray(lssm.eigenvectors[0])
    np.testing.assert_allclose(q.T @ q, np.eye(q.shape[1]), atol=1e-4)
    # project/decode reconstructs the training shapes reasonably
    w = ssm_project(lssm, jnp.asarray(shapes))
    rec = ssm_decode(lssm, w)
    err = float(jnp.abs(rec - shapes).mean())
    assert err < 0.02, err


def test_lssm_beats_global_pca_on_local_variation():
    shapes = _shape_population()
    ssm = fit_ssm(shapes, target_variance=0.95)
    lssm = fit_lssm(shapes, num_levels=3, target_variance=0.95)
    # localized model should reconstruct at least as well with its basis
    rec_g = ssm_decode(ssm, ssm_project(ssm, jnp.asarray(shapes)))
    rec_l = ssm_decode(lssm, ssm_project(lssm, jnp.asarray(shapes)))
    err_g = float(jnp.square(rec_g - shapes).mean())
    err_l = float(jnp.square(rec_l - shapes).mean())
    assert err_l <= err_g * 1.5


def _two_sheets(rng, n=150, shift=(0, 0, 0), scale=1.0):
    u = rng.uniform(-1, 1, (n, 2))
    a = np.concatenate([u, 0.2 * u[:, :1]], 1) * scale + shift
    b = np.concatenate([u, 0.5 + 0.1 * u[:, 1:]], 1) * scale + shift
    return [a.astype(np.float32), b.astype(np.float32)]


def test_generate_corresponding_points(tmp_path):
    rng = np.random.default_rng(0)
    cases = [_two_sheets(rng),
             _two_sheets(rng, shift=(0.2, 0.1, 0.0)),
             _two_sheets(rng, scale=1.1)]
    corr, labels, transforms = generate_corresponding_points(
        cases, n_per_object=32, rigid_iters=25, deform_iters=25)
    assert corr.shape == (3, 64, 3)
    assert set(np.unique(labels)) == {1, 2}
    # fixed case transform is identity
    np.testing.assert_allclose(transforms[0]["rotation"], np.eye(3), atol=1e-6)
    # corresponding points of different cases are mutually close in the
    # registered frame (same anatomical locations)
    d01 = np.linalg.norm(corr[0] - corr[1], axis=1).mean()
    assert d01 < 0.25, d01

    save_corresponding_points(str(tmp_path), [("a", "s0"), ("b", "s0"), ("c", "s0")],
                              corr, labels, transforms)
    ids, corr2, labels2, tr2 = load_corresponding_points(str(tmp_path))
    assert ids[0] == ("a", "s0")
    np.testing.assert_allclose(corr2, corr)
    assert float(tr2[2]["scale"]) == pytest.approx(transforms[2]["scale"])


def test_plane_fitting():
    rng = np.random.default_rng(1)
    n_true = np.asarray([0.2, -0.3, 0.93])
    n_true = n_true / np.linalg.norm(n_true)
    d_true = 7.0
    # points on the plane + noise
    basis = np.linalg.svd(n_true[None])[2][1:]
    uv = rng.uniform(-10, 10, (500, 2))
    pts = d_true * n_true + uv @ basis + rng.normal(0, 0.05, (500, 3))
    pts = jnp.asarray(pts, jnp.float32)

    n0, d0 = plane_from_points_lstsq(pts)
    assert abs(abs(float(n0 @ n_true)) - 1) < 1e-3

    n, d = fit_plane_to_fissure(pts, steps=100)
    align = abs(float(n @ n_true))
    assert align > 0.999
    assert abs(abs(float(d)) - d_true) < 0.1

    tris, valid = plane_to_mesh(np.asarray(n), float(d), (32, 32, 32))
    assert tris.shape[1:] == (3, 3)
    # triangle vertices lie on the plane
    on = np.abs(tris.reshape(-1, 3) @ np.asarray(n) - float(d))
    assert on.max() < 1e-3
