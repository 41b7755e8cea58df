"""bf16 compute path (AMP analog, model_trainer.py:92): same parameter tree
as f32, float32 outputs, numerics within mixed-precision tolerance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.models import DGCNNSeg, DGCNNReg
from fissure_segmentation_tpu.models.dgcnn_cls import DGCNNCls


@pytest.mark.parametrize("cls,kw", [
    (DGCNNSeg, dict(k=8, in_features=4, num_classes=4, dynamic=False)),
    (DGCNNReg, dict(k=8, in_features=3, num_classes=6)),
])
def test_bf16_matches_f32_params_and_numerics(cls, kw):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, kw["in_features"]))
    m32 = cls(**kw)
    m16 = cls(**kw, dtype=jnp.bfloat16)
    v = m32.init(jax.random.PRNGKey(1), x, train=False)
    # identical parameter trees: bf16 variant consumes f32 params directly
    o32 = m32.apply(v, x, train=False)
    o16 = m16.apply(v, x, train=False)
    assert o16.dtype == jnp.float32
    assert o16.shape == o32.shape
    rel = float(jnp.abs(o32 - o16).max() / (jnp.abs(o32).max() + 1e-9))
    assert rel < 0.05, rel


def test_bf16_cls_backbone():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 3))
    m = DGCNNCls(k=8, output_channels=6, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    y, g = m.apply(v, x, train=False)
    assert y.dtype == jnp.float32 and g.dtype == jnp.float32
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_bf16_gradients_finite():
    m16 = DGCNNSeg(k=8, in_features=3, num_classes=4, dynamic=False,
                   dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
    v = m16.init(jax.random.PRNGKey(1), x, train=False)

    def loss(params):
        out = m16.apply({"params": params, "batch_stats": v["batch_stats"]},
                        x, train=True, mutable=["batch_stats"])[0]
        return (out ** 2).mean()

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(jnp.isfinite(l).all() for l in leaves)
    # grads come back in the param dtype (f32 master weights)
    assert all(l.dtype == jnp.float32 for l in leaves)
