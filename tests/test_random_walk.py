"""Random-walk tests following the reference's toy examples
(data_processing/random_walk.py:215-280: diagonal-plane segmentation)."""
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.postprocess.random_walk import (fill_lobes,
                                                              lobes_to_fissures,
                                                              random_walk)


def _diag_plane_volume(n=20):
    """Volume with a diagonal 'fissure' plane of 1s; z > x+offset is side B."""
    vol = np.zeros((n, n, n), np.float32)
    z, y, x = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    plane = np.abs(z - x) <= 0
    vol[plane] = 1.0
    side_b = z > x
    return vol, side_b


def test_random_walk_toy_3d():
    n = 16
    vol, side_b = _diag_plane_volume(n)
    labels = np.zeros((n, n, n), np.int32)
    labels[0, :, n - 1] = 1   # side A seed (z=0, x=max)
    labels[n - 1, :, 0] = 2   # side B seed (z=max, x=0)
    probs = random_walk(jnp.asarray(vol), jnp.asarray(labels), n_objects=2,
                        edge_weights="binary", cg_iters=300)
    seg = np.asarray(jnp.argmax(probs, -1)) + 1
    # off-plane voxels segmented by side
    off_plane = vol == 0
    acc = (seg[off_plane] == np.where(side_b, 2, 1)[off_plane]).mean()
    assert acc > 0.95, acc


def test_random_walk_respects_mask():
    n = 12
    vol = np.zeros((n, n, n), np.float32)
    labels = np.zeros((n, n, n), np.int32)
    labels[0, 0, 0] = 1
    mask = np.zeros((n, n, n), bool)
    mask[:, :, : n // 2] = True
    probs = np.asarray(random_walk(jnp.asarray(vol), jnp.asarray(labels), 1,
                                   graph_mask=jnp.asarray(mask), cg_iters=100))
    assert (probs[~mask] == 0).all()
    assert probs[mask].max() > 0.9


def test_lobes_to_fissures_synthetic():
    # two "lobes" split by a flat plane inside a spherical mask
    n = 24
    z = np.arange(n)[:, None, None]
    mask = np.ones((n, n, n), bool)
    lobes = np.zeros((n, n, n), np.int32)
    # seeds: lobe 3 (LLL) below, lobe 4 (LUL) above, sparse scribbles
    lobes[2, 10:14, 10:14] = 3
    lobes[n - 3, 10:14, 10:14] = 4
    fissures, filled = lobes_to_fissures(jnp.asarray(lobes), jnp.asarray(mask),
                                         cg_iters=300)
    filled = np.asarray(filled)
    fissures = np.asarray(fissures)
    assert set(np.unique(filled)) == {3, 4}
    # fissure voxels (label 1 = left fissure) form a band around the boundary
    assert (fissures == 1).sum() > 0
    zs = np.argwhere(fissures == 1)[:, 0]
    assert 2 < zs.mean() < n - 3
