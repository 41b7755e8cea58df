"""Fused single-layer EdgeConv (ops/fused_edge.py + models.blocks.
FusedEdgeMLPMax) vs the materialized reference composition.

Off-TPU the scatter kernels run in interpret mode; FSEG_FUSED_EDGE=1
force-enables the fused routing for the module-level tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.ops.edge import _flat_gather
from fissure_segmentation_tpu.ops.fused_edge import (fused_edge_eval,
                                                     fused_edge_train)
from fissure_segmentation_tpu.ops.pallas.scatter import (scatter_add_routed,
                                                         scatter_count)

B, N, K, C = 2, 64, 7, 24
EPS, SLOPE = 1e-5, 0.2


def _case(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.normal(size=(B, N, C)), dtype)
    cen = jnp.asarray(rng.normal(size=(B, N, C)), dtype)
    # negative scale channels exercise the min/argmin routing
    gamma = jnp.asarray(rng.normal(size=C) + 0.3, jnp.float32)
    beta = jnp.asarray(rng.normal(size=C) * 0.2, jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, size=(B, N, K)), jnp.int32)
    return a, cen, gamma, beta, idx


def _reference_core(a, cen, gamma, beta, idx):
    """Materialized gather -> +center -> flax-semantics BN (train) ->
    LeakyReLU -> max over k."""
    z = _flat_gather(a, idx) + cen[:, :, None, :]
    zf = z.astype(jnp.float32)
    mean = zf.mean((0, 1, 2))
    var = jnp.maximum(0.0, (zf * zf).mean((0, 1, 2)) - mean * mean)
    u = gamma * (zf - mean) / jnp.sqrt(var + EPS) + beta
    y = jnp.where(u >= 0, u, SLOPE * u).astype(a.dtype)
    return jnp.max(y, axis=2), mean, var


def test_scatter_add_routed_matches_naive():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, N, size=(B, N, K)).astype(np.int32)
    kstar = rng.integers(0, K, size=(B, N, C)).astype(np.int32)
    s = rng.normal(size=(B, N, C)).astype(np.float32)
    p = rng.normal(size=(B, N, C)).astype(np.float32)

    out = np.asarray(scatter_add_routed(jnp.asarray(idx), jnp.asarray(kstar),
                                        jnp.asarray(s), jnp.asarray(p), N))
    want = np.zeros((B, N, 2 * C), np.float64)
    for b in range(B):
        for n_ in range(N):
            for c_ in range(C):
                want[b, idx[b, n_, kstar[b, n_, c_]], c_] += s[b, n_, c_]
            for k_ in range(K):
                want[b, idx[b, n_, k_], C:] += p[b, n_]
    np.testing.assert_allclose(out, want, rtol=5e-4, atol=5e-4)


def test_scatter_add_routed_bf16_payloads():
    rng = np.random.default_rng(2)
    idx = rng.integers(0, N, size=(B, N, K)).astype(np.int32)
    kstar = rng.integers(0, K, size=(B, N, C)).astype(np.int32)
    s = rng.normal(size=(B, N, C)).astype(np.float32)
    out = scatter_add_routed(jnp.asarray(idx), jnp.asarray(kstar),
                             jnp.asarray(s, jnp.bfloat16).astype(jnp.bfloat16),
                             jnp.asarray(s, jnp.bfloat16).astype(jnp.bfloat16),
                             N)
    ref = scatter_add_routed(jnp.asarray(idx), jnp.asarray(kstar),
                             jnp.asarray(s), jnp.asarray(s), N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=5e-2)


def test_scatter_count_matches_bincount():
    rng = np.random.default_rng(3)
    e = N * K
    idx = rng.integers(0, N, size=(B, e)).astype(np.int32)
    out = np.asarray(scatter_count(jnp.asarray(idx), N))
    for b in range(B):
        np.testing.assert_array_equal(out[b],
                                      np.bincount(idx[b], minlength=N))


def test_scatter_count_padded_tile():
    # E not a multiple of tile_e exercises the pad-row correction
    rng = np.random.default_rng(4)
    e = 1000
    idx = rng.integers(0, N, size=(1, e)).astype(np.int32)
    out = np.asarray(scatter_count(jnp.asarray(idx), N, tile_e=256))
    np.testing.assert_array_equal(out[0], np.bincount(idx[0], minlength=N))


def test_fused_forward_matches_reference_f32():
    a, cen, gamma, beta, idx = _case(5)
    out, mean, var = fused_edge_train(a, cen, gamma, beta, idx, EPS, SLOPE)
    ref, rmean, rvar = _reference_core(a, cen, gamma, beta, idx)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(rmean),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(rvar),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_reference_f32():
    a, cen, gamma, beta, idx = _case(6)
    w = jnp.asarray(np.random.default_rng(7).normal(size=(B, N, C)),
                    jnp.float32)

    def loss_fused(a, cen, gamma, beta):
        out, _, _ = fused_edge_train(a, cen, gamma, beta, idx, EPS, SLOPE)
        return jnp.sum(out * w)

    def loss_ref(a, cen, gamma, beta):
        out, _, _ = _reference_core(a, cen, gamma, beta, idx)
        return jnp.sum(out * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(a, cen, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(a, cen, gamma, beta)
    for got, want, name in zip(gf, gr, ("a", "cen", "gamma", "beta")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=5e-4, err_msg=name)


def test_fused_eval_matches_reference():
    a, cen, gamma, beta, idx = _case(8)
    ra_mean = jnp.asarray(np.random.default_rng(9).normal(size=C) * 0.1,
                          jnp.float32)
    ra_var = jnp.asarray(np.random.default_rng(10).uniform(0.5, 2.0, C),
                         jnp.float32)
    out = fused_edge_eval(a, cen, gamma, beta, ra_mean, ra_var, idx,
                          EPS, SLOPE)
    z = _flat_gather(a, idx) + cen[:, :, None, :]
    u = gamma * (z.astype(jnp.float32) - ra_mean) / jnp.sqrt(ra_var + EPS) \
        + beta
    ref = jnp.max(jnp.where(u >= 0, u, SLOPE * u), axis=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_forward_bf16_close_to_f32():
    a, cen, gamma, beta, idx = _case(11, jnp.bfloat16)
    out, _, _ = fused_edge_train(a, cen, gamma, beta, idx, EPS, SLOPE)
    ref, _, _ = _reference_core(a, cen, gamma, beta, idx)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=5e-2)


@pytest.fixture
def fused_env(monkeypatch):
    monkeypatch.setenv("FSEG_FUSED_EDGE", "1")
    yield


def test_edgeconv_module_fused_vs_unfused(fused_env, monkeypatch):
    """EdgeConv with one shared-MLP layer routes through FusedEdgeMLPMax;
    same parameter tree, same outputs/grads/batch-stats as the unfused
    path within f32 tolerance."""
    from fissure_segmentation_tpu.models.dgcnn import EdgeConv

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(B, N, 8)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, size=(B, N, K)), jnp.int32)
    mod = EdgeConv([16], k=K)
    variables = mod.init(jax.random.PRNGKey(0), x, idx, True)

    def run(train):
        if train:
            return mod.apply(variables, x, idx, True,
                             mutable=["batch_stats"])
        return mod.apply(variables, x, idx, False), None

    out_f, mut_f = run(True)

    def loss_f(params):
        out, _ = mod.apply({**variables, "params": params}, x, idx, True,
                           mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    grads_f = jax.grad(loss_f)(variables["params"])
    eval_f = mod.apply(variables, x, idx, False)

    monkeypatch.setenv("FSEG_FUSED_EDGE", "0")
    mod_u = EdgeConv([16], k=K)
    vars_u = mod_u.init(jax.random.PRNGKey(0), x, idx, True)
    assert jax.tree_util.tree_structure(vars_u) == \
        jax.tree_util.tree_structure(variables)
    out_u, mut_u = mod_u.apply(vars_u, x, idx, True,
                               mutable=["batch_stats"])

    def loss_u(params):
        out, _ = mod_u.apply({**vars_u, "params": params}, x, idx, True,
                             mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    grads_u = jax.grad(loss_u)(vars_u["params"])
    eval_u = mod_u.apply(vars_u, x, idx, False)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(eval_f), np.asarray(eval_u),
                               rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda g1, g2: np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=5e-4, atol=5e-4),
        grads_f, grads_u)
    jax.tree_util.tree_map(
        lambda s1, s2: np.testing.assert_allclose(
            np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-6),
        mut_f["batch_stats"], mut_u["batch_stats"])


@pytest.mark.slow
def test_dgcnn_seg_fused_train_step(fused_env):
    """Full DGCNNSeg with fused EdgeConvs: one value_and_grad step runs and
    matches the unfused model's loss within tolerance."""
    import os

    from fissure_segmentation_tpu.losses.segmentation import nnu_loss
    from fissure_segmentation_tpu.models import DGCNNSeg

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, size=(2, 64)), jnp.int32)
    model = DGCNNSeg(k=K, in_features=3, num_classes=4, dynamic=False)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(params, bs):
        logits, mut = model.apply({"params": params, "batch_stats": bs},
                                  x, train=True, mutable=["batch_stats"])
        l, _ = nnu_loss(logits, y)
        return l

    l_fused, g_fused = jax.value_and_grad(loss_fn)(
        variables["params"], variables["batch_stats"])

    os.environ["FSEG_FUSED_EDGE"] = "0"
    try:
        l_unf, g_unf = jax.value_and_grad(loss_fn)(
            variables["params"], variables["batch_stats"])
    finally:
        os.environ["FSEG_FUSED_EDGE"] = "1"

    np.testing.assert_allclose(float(l_fused), float(l_unf),
                               rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda g1, g2: np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4),
        g_fused, g_unf)


def test_edgeconv_fused_tail_vs_unfused(monkeypatch):
    """Multi-layer EdgeConv with the fused last-sublayer tail
    (blocks.FusedEdgeTail): identical parameter tree, and outputs / grads /
    batch-stats / eval match the unfused Dense+BN+LReLU+max composition."""
    from fissure_segmentation_tpu.models.dgcnn import EdgeConv

    monkeypatch.setenv("FSEG_FUSED_EDGE", "0")  # isolate the tail fusion
    monkeypatch.setenv("FSEG_FUSED_EDGE_TAIL", "1")
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(B, N, 8)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, size=(B, N, K)), jnp.int32)
    mod = EdgeConv([16, 16], k=K)
    variables = mod.init(jax.random.PRNGKey(0), x, idx, True)
    # negative BN scales exercise the min-extremum branch
    bn = variables["params"]["SharedMLP_0"]["BatchNorm_0"]
    neg = jnp.asarray(rng.normal(size=16) + 0.3, jnp.float32)
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    variables["params"]["SharedMLP_0"]["BatchNorm_0"] = {**bn, "scale": neg}

    out_f, mut_f = mod.apply(variables, x, idx, True, mutable=["batch_stats"])

    def loss(params, m):
        o, _ = m.apply({**variables, "params": params}, x, idx, True,
                       mutable=["batch_stats"])
        return jnp.sum(o ** 2)

    grads_f = jax.grad(lambda p: loss(p, mod))(variables["params"])
    eval_f = mod.apply(variables, x, idx, False)

    monkeypatch.setenv("FSEG_FUSED_EDGE_TAIL", "0")
    mod_u = EdgeConv([16, 16], k=K)
    vars_u = mod_u.init(jax.random.PRNGKey(0), x, idx, True)
    assert jax.tree_util.tree_structure(vars_u) == \
        jax.tree_util.tree_structure(variables)
    out_u, mut_u = mod_u.apply(variables, x, idx, True,
                               mutable=["batch_stats"])
    grads_u = jax.grad(lambda p: loss(p, mod_u))(variables["params"])
    eval_u = mod_u.apply(variables, x, idx, False)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(eval_f), np.asarray(eval_u),
                               rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda g1, g2: np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=5e-4, atol=5e-4),
        grads_f, grads_u)
    jax.tree_util.tree_map(
        lambda s1, s2: np.testing.assert_allclose(
            np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-6),
        mut_f["batch_stats"], mut_u["batch_stats"])
