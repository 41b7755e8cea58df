"""Point-axis ring sharding (parallel/points.py): ring-kNN + ring gather
parity with the dense single-device ops on a virtual multi-device CPU
mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.ops.edge import edge_features, gather_neighbors
from fissure_segmentation_tpu.ops.knn import knn
from fissure_segmentation_tpu.parallel import (make_mesh,
                                               sharded_edge_features,
                                               sharded_gather_neighbors,
                                               sharded_knn)


def _mesh(n=8):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return make_mesh(("data",), devices=jax.devices()[:n])


def test_sharded_knn_matches_dense():
    mesh = _mesh(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (512, 3))
    for self_loop in (False, True):
        ref_idx, ref_d = knn(x, 16, self_loop=self_loop, return_dist=True,
                             use_pallas=False)
        idx, d = sharded_knn(x, 16, mesh, self_loop=self_loop,
                             return_dist=True)
        # neighbor *sets* and distances must agree (tie order may differ)
        np.testing.assert_allclose(np.sort(np.asarray(d), -1),
                                   np.sort(np.asarray(ref_d), -1),
                                   atol=1e-4)
        assert (np.sort(np.asarray(idx), -1)
                == np.sort(np.asarray(ref_idx), -1)).all()


def test_sharded_knn_sorted_and_self_first():
    mesh = _mesh(8)
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 3))
    idx, d = sharded_knn(x, 8, mesh, self_loop=True, return_dist=True)
    d = np.asarray(d)
    assert (np.diff(d, axis=-1) >= -1e-6).all()          # ascending
    assert (np.asarray(idx)[:, 0] == np.arange(256)).all()  # self first


def test_sharded_gather_matches_dense():
    mesh = _mesh(8)
    feats = jax.random.normal(jax.random.PRNGKey(2), (256, 12))
    idx = jax.random.randint(jax.random.PRNGKey(3), (256, 7), 0, 256)
    out = sharded_gather_neighbors(feats, idx, mesh)
    ref = gather_neighbors(feats, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_sharded_edge_features_matches_dense():
    mesh = _mesh(8)
    x = jax.random.normal(jax.random.PRNGKey(4), (256, 6))
    out = np.asarray(sharded_edge_features(x, 8, mesh))
    idx = knn(x, 8, self_loop=False, use_pallas=False)
    ref = np.asarray(edge_features(x, idx))
    # neighbor order within k may differ on ties: compare sorted over k
    np.testing.assert_allclose(np.sort(out, axis=1), np.sort(ref, axis=1),
                               atol=1e-5)


def test_single_device_mesh():
    mesh = _mesh(1)
    x = jax.random.normal(jax.random.PRNGKey(5), (64, 3))
    idx = sharded_knn(x, 4, mesh)
    ref = knn(x, 4, use_pallas=False)
    assert (np.sort(np.asarray(idx), -1) == np.sort(np.asarray(ref), -1)).all()
