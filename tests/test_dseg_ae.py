import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.models import DGCNNSeg
from fissure_segmentation_tpu.models.dseg_ae import (RegularizedSegDGCNN,
                                                     random_extend_points)
from fissure_segmentation_tpu.models.folding_net import DGCNNFoldingNet
import pytest


def test_random_extend_points(rng):
    pts = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
    valid = jnp.arange(64)[None] < 20
    new_pts, new_valid = random_extend_points(jax.random.PRNGKey(0), pts,
                                              valid, 50)
    assert int(new_valid.sum()) == 50
    # original points unchanged
    np.testing.assert_allclose(np.asarray(new_pts[0, :20]),
                               np.asarray(pts[0, :20]))
    # jittered points near the original cloud
    jit = np.asarray(new_pts[0, 20:50])
    assert np.abs(jit).max() < np.abs(np.asarray(pts[0, :20])).max() + 3.0


@pytest.mark.slow
def test_regularized_seg_dgcnn():
    seg = DGCNNSeg(k=8, in_features=3, num_classes=3, dynamic=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 3))
    seg_vars = seg.init(jax.random.PRNGKey(1), x, train=False)
    ae = DGCNNFoldingNet(k=8, n_embedding=32, shape_type="plane",
                         n_input_points=64, decode_mesh=True)
    ae_vars = ae.init(jax.random.PRNGKey(2), x, train=False)

    model = RegularizedSegDGCNN(seg, seg_vars, ae, ae_vars,
                                n_points_seg=64, n_points_ae=64,
                                random_extend=True)
    pc = jax.random.normal(jax.random.PRNGKey(3), (300, 3))
    outputs, labels = model(pc, jax.random.PRNGKey(4))
    assert labels.shape == (300,)
    assert len(outputs) == 2  # classes 1, 2
    for out in outputs:
        if out is None:
            continue
        verts, faces = out
        assert verts.shape == (1, ae.m, 3)
