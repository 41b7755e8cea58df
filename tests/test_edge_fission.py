"""Matmul-before-gather EdgeConv fission (ops.edge_mlp_pre_gather, EdgeMLP).

The fission must be mathematically identical to the explicit path
``edge_features(x, idx) @ w`` (reference models/dgcnn.py:15-36 + conv):
values AND gradients, up to matmul reassociation rounding.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.models.blocks import EdgeMLP, SharedMLP
from fissure_segmentation_tpu.ops import edge_features, edge_mlp_pre_gather, knn


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_op_matches_explicit_path():
    rng = np.random.default_rng(0)
    b, n, k, c, f = 2, 64, 7, 12, 16
    x = _rand(rng, b, n, c)
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)), jnp.int32)
    w = _rand(rng, 2 * c, f)

    hp = jax.lax.Precision.HIGHEST
    explicit = jnp.einsum("bnke,ef->bnkf", edge_features(x, idx), w,
                          precision=hp)
    fused = edge_mlp_pre_gather(x, idx, w)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(explicit),
                               rtol=2e-2, atol=2e-2)


def test_grads_match_explicit_path():
    rng = np.random.default_rng(1)
    b, n, k, c, f = 2, 32, 5, 8, 8
    x = _rand(rng, b, n, c)
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)), jnp.int32)
    w = _rand(rng, 2 * c, f)
    ct = _rand(rng, b, n, k, f)

    def loss_explicit(x, w):
        return jnp.sum(edge_features(x, idx) @ w * ct)

    def loss_fused(x, w):
        return jnp.sum(edge_mlp_pre_gather(x, idx, w) * ct)

    ge = jax.grad(loss_explicit, argnums=(0, 1))(x, w)
    gf = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    for a, b_ in zip(ge, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=3e-2, atol=3e-2)


def test_edge_mlp_module_matches_shared_mlp():
    """EdgeMLP == SharedMLP applied to the explicit edge tensor, with the
    kernel transplanted (same (2C, F) layout)."""
    rng = np.random.default_rng(2)
    b, n, k, c, f = 2, 48, 6, 10, 16
    x = _rand(rng, b, n, c)
    idx = knn(x[..., :3], k, self_loop=False)

    fused = EdgeMLP(f)
    vf = fused.init(jax.random.PRNGKey(0), x, idx, train=False)

    ref = SharedMLP(f)
    vr = ref.init(jax.random.PRNGKey(1), edge_features(x, idx), train=False)
    vr = jax.tree_util.tree_map(lambda a: a, vr)
    vr["params"]["Dense_0"]["kernel"] = vf["params"]["kernel"]

    for train in (False, True):
        out_f = fused.apply(vf, x, idx, train=train,
                            mutable=["batch_stats"] if train else False)
        out_r = ref.apply(vr, edge_features(x, idx), train=train,
                          mutable=["batch_stats"] if train else False)
        yf = out_f[0] if train else out_f
        yr = out_r[0] if train else out_r
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("bad_rows", [10, 33])
def test_kernel_shape_validated(bad_rows):
    x = jnp.zeros((1, 4, 8))
    idx = jnp.zeros((1, 4, 2), jnp.int32)
    with pytest.raises(ValueError):
        edge_mlp_pre_gather(x, idx, jnp.zeros((bad_rows, 4)))


def test_mm_scatter_tile_vmem_guard():
    """Routing admits only shapes whose kernel footprint fits VMEM: the
    canonical config keeps the fast tile, N=8192 degrades the tile, and
    an accumulator beyond budget falls back to the XLA scatter (None)."""
    from fissure_segmentation_tpu.ops.edge import _mm_scatter_tile

    assert _mm_scatter_tile(2048, 64, True) == 1024    # canonical DGCNN
    assert _mm_scatter_tile(8192, 64, True) == 256     # big cloud: shrink
    assert _mm_scatter_tile(8192, 512, True) is None   # acc alone > budget
    assert _mm_scatter_tile(2048, 512, False) is not None
