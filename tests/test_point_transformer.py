import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.models.point_transformer import PointTransformerSeg
from fissure_segmentation_tpu.ops.fps import farthest_point_sampling
from fissure_segmentation_tpu.ops.pointops import interpolate, knn_query, query_and_group
import pytest


def test_fps_spreads_points(rng):
    # two clusters -> fps with m=2 must pick one from each
    a = rng.normal(size=(50, 3)).astype(np.float32) * 0.01
    b = a + 10.0
    pts = jnp.asarray(np.concatenate([a, b]))
    idx = farthest_point_sampling(pts, 2)
    assert int(idx[0]) == 0
    assert int(idx[1]) >= 50  # second point from the far cluster
    # no duplicates for m << n
    idx10 = np.asarray(farthest_point_sampling(pts, 10))
    assert len(set(idx10.tolist())) == 10


def test_fps_respects_mask(rng):
    pts = jnp.asarray(rng.normal(size=(1, 40, 3)).astype(np.float32))
    mask = jnp.arange(40)[None] < 20
    idx = np.asarray(farthest_point_sampling(pts, 8, mask=mask))[0]
    assert (idx < 20).all()


def test_knn_query_and_group(rng):
    sup = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    q = sup[:, :16]
    idx, dist = knn_query(sup, q, 4)
    assert idx.shape == (2, 16, 4)
    # query points are in the support -> first neighbor is self at distance 0
    np.testing.assert_allclose(np.asarray(dist[..., 0]), 0.0, atol=1e-3)
    feat = jnp.asarray(rng.normal(size=(2, 64, 5)).astype(np.float32))
    grouped, _ = query_and_group(sup, q, feat, 4, idx=idx, use_xyz=True)
    assert grouped.shape == (2, 16, 4, 8)
    # relative coords of the self-neighbor are 0
    np.testing.assert_allclose(np.asarray(grouped[..., 0, :3]), 0.0, atol=1e-5)


def test_interpolate_constant_field(rng):
    coarse = jnp.asarray(rng.normal(size=(1, 16, 3)).astype(np.float32))
    fine = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
    feat = jnp.ones((1, 16, 7))
    out = interpolate(coarse, fine, feat)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


@pytest.mark.slow
def test_point_transformer_seg_shapes():
    model = PointTransformerSeg(in_features=4, num_classes=4,
                                blocks=(1, 1, 1, 1, 1))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 4))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 256, 4)
    out2, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mut


def test_attention_softmax_over_neighbor_axis():
    """The vector-attention weights must normalize over the NEIGHBOR axis
    (reference seg_model.py:33 nn.Softmax(dim=1) on (n, nsample, c)):
    jnp.softmax with the fixed axis sums to 1 per (query, channel)."""
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    w = jnp.asarray(np.random.RandomState(0).randn(2, 5, 7, 3))
    s = nn.softmax(w, axis=-2)
    np.testing.assert_allclose(np.asarray(s.sum(axis=-2)), 1.0, atol=1e-6)
    # the previously used axis (-3) does NOT normalize neighborhoods
    assert not np.allclose(np.asarray(nn.softmax(w, axis=-3).sum(-2)), 1.0)
