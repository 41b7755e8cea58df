"""Parity tests: Pallas kernels vs. their XLA reference implementations.

On CPU the kernels run in interpreter mode (ops/_config.py), so shapes are
kept tiny. On TPU the same assertions hold with the compiled kernels (the
knn distance formula differs by ~1 ulp, hence the tolerance-based index
comparison).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.ops.knn import knn
from fissure_segmentation_tpu.ops.pallas.knn import knn_pallas
from fissure_segmentation_tpu.ops.fps import farthest_point_sampling
from fissure_segmentation_tpu.ops.pallas.fps import fps_pallas
from fissure_segmentation_tpu.ops.pallas.scatter import scatter_add_mm


def _assert_knn_equiv(i_ref, d_ref, i_pal, d_pal):
    """Indices must match except where near-exact distance ties flip."""
    np.testing.assert_allclose(np.sort(d_pal, -1), np.sort(d_ref, -1),
                               rtol=1e-5, atol=1e-5)
    mism = np.asarray(i_ref != i_pal)
    if mism.any():
        # every mismatch must be a tie in distance
        np.testing.assert_allclose(np.asarray(d_ref)[mism],
                                   np.asarray(d_pal)[mism],
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("self_loop", [False, True])
def test_knn_pallas_matches_xla(rng, self_loop):
    x = jnp.asarray(rng.standard_normal((2, 70, 3)), jnp.float32)
    i_ref, d_ref = knn(x, 5, self_loop=self_loop, return_dist=True,
                       use_pallas=False)
    i_pal, d_pal = knn_pallas(x, 5, self_loop=self_loop, return_dist=True,
                              tq=64, tk=64)
    _assert_knn_equiv(i_ref, d_ref, i_pal, d_pal)


def test_knn_pallas_padding_and_tiling(rng):
    # N not a multiple of the tile sizes -> exercises the padding masks
    x = jnp.asarray(rng.standard_normal((1, 150, 3)), jnp.float32)
    i_ref, d_ref = knn(x, 7, return_dist=True, use_pallas=False)
    i_pal, d_pal = knn_pallas(x, 7, return_dist=True, tq=64, tk=64)
    _assert_knn_equiv(i_ref, d_ref, i_pal, d_pal)


def test_knn_pallas_2d_input(rng):
    x = jnp.asarray(rng.standard_normal((40, 3)), jnp.float32)
    i_ref = knn(x, 4, use_pallas=False)
    i_pal = knn_pallas(x, 4, tq=64, tk=64)
    assert i_pal.shape == i_ref.shape
    d_ref = knn(x, 4, return_dist=True, use_pallas=False)[1]
    d_pal = knn_pallas(x, 4, return_dist=True, tq=64, tk=64)[1]
    _assert_knn_equiv(i_ref, d_ref, i_pal, d_pal)


def test_fps_pallas_matches_xla(rng):
    p = jnp.asarray(rng.standard_normal((2, 140, 3)), jnp.float32)
    f_ref = farthest_point_sampling(p, 9, use_pallas=False)
    f_pal = fps_pallas(p, 9)
    np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f_pal))


def test_fps_pallas_masked(rng):
    p = jnp.asarray(rng.standard_normal((2, 140, 3)), jnp.float32)
    mask = jnp.asarray(rng.random((2, 140)) > 0.4)
    f_ref = farthest_point_sampling(p, 9, mask, use_pallas=False)
    f_pal = fps_pallas(p, 9, mask)
    np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f_pal))
    # masked-out points are never selected
    assert bool(jnp.all(jnp.take_along_axis(mask, f_pal, axis=1)))


def test_fps_pallas_2d_input(rng):
    p = jnp.asarray(rng.standard_normal((70, 3)), jnp.float32)
    f_ref = farthest_point_sampling(p, 5, use_pallas=False)
    f_pal = fps_pallas(p, 5)
    np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f_pal))


def _scatter_ref(idx, g, n_rows):
    b, e = idx.shape
    return np.asarray(
        jnp.zeros((b, n_rows, g.shape[-1]), jnp.float32)
        .at[jnp.arange(b)[:, None], idx].add(g.astype(jnp.float32)))


@pytest.mark.parametrize("dtype,exact,tol", [
    (jnp.float32, False, 2e-5),   # hi+lo bf16 split: ~16 mantissa bits
    (jnp.float32, True, 1e-6),    # f32 one-hot matmul: exact
    (jnp.bfloat16, False, 1e-6),  # bf16 payload: accumulation exact in f32
])
def test_scatter_add_mm_matches_xla(rng, dtype, exact, tol):
    b, e, n, c = 2, 512, 96, 16
    idx = jnp.asarray(rng.integers(0, n, (b, e)), jnp.int32)
    g = jnp.asarray(rng.standard_normal((b, e, c)), dtype)
    out = scatter_add_mm(idx, g, n, tile_e=256, exact=exact)
    ref = _scatter_ref(idx, g, n)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(np.asarray(out) / scale, ref / scale, atol=tol)


@pytest.mark.parametrize("dtype,tol", [
    (jnp.float32, 2e-5),          # hi+lo bf16 split: ~16 mantissa bits
    (jnp.bfloat16, 1e-6),         # bf16 payload: accumulation exact in f32
])
def test_scatter_add_mm2_matches_xla(rng, dtype, tol):
    from fissure_segmentation_tpu.ops.pallas.scatter import scatter_add_mm2
    b, e, n, c = 2, 512, 300, 16   # n not a multiple of n_lo
    idx = jnp.asarray(rng.integers(0, n, (b, e)), jnp.int32)
    g = jnp.asarray(rng.standard_normal((b, e, c)), dtype)
    out = scatter_add_mm2(idx, g, n, tile_e=256, n_lo=128)
    assert out.shape == (b, n, c)
    ref = _scatter_ref(idx, g, n)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(np.asarray(out) / scale, ref / scale, atol=tol)


def test_scatter_add_mm2_padding_and_autosplit(rng):
    from fissure_segmentation_tpu.ops.pallas.scatter import scatter_add_mm2
    b, e, n, c = 1, 300, 256, 8    # E not a multiple of tile_e; auto n_lo
    idx = jnp.asarray(rng.integers(0, n, (b, e)), jnp.int32)
    g = jnp.asarray(rng.standard_normal((b, e, c)), jnp.float32)
    out = scatter_add_mm2(idx, g, n, tile_e=256)
    ref = _scatter_ref(idx, g, n)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(np.asarray(out) / scale, ref / scale,
                               atol=2e-5)


def test_scatter_add_mm_padding(rng):
    # E not a multiple of tile_e -> pad rows must contribute nothing
    b, e, n, c = 1, 300, 50, 8
    idx = jnp.asarray(rng.integers(0, n, (b, e)), jnp.int32)
    g = jnp.asarray(rng.standard_normal((b, e, c)), jnp.float32)
    out = scatter_add_mm(idx, g, n, tile_e=256, exact=True)
    np.testing.assert_allclose(np.asarray(out), _scatter_ref(idx, g, n),
                               atol=1e-6)


def test_gather_neighbors_grad_matches_scatter(rng):
    """The custom VJP of gather_neighbors must equal the XLA scatter-add
    transpose (on CPU both take the same path; on TPU this checks the
    one-hot-matmul backward end to end through jax.grad)."""
    from fissure_segmentation_tpu.ops.edge import gather_neighbors
    b, n, k, c = 2, 64, 5, 12
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((b, n, k, c)), jnp.float32)

    g_custom = jax.grad(lambda v: jnp.sum(gather_neighbors(v, idx) * w))(x)
    g_ref = jax.grad(lambda v: jnp.sum(
        jnp.take_along_axis(v[:, None], idx[..., None], axis=2) * w))(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_dispatchers_auto_route(rng):
    """knn/fps auto-dispatch must be a no-op on CPU (XLA path)."""
    x = jnp.asarray(rng.standard_normal((2, 50, 3)), jnp.float32)
    assert jnp.all(knn(x, 4) == knn(x, 4, use_pallas=False))
    p = jnp.asarray(rng.standard_normal((2, 50, 3)), jnp.float32)
    assert jnp.all(farthest_point_sampling(p, 6)
                   == farthest_point_sampling(p, 6, use_pallas=False))


def test_depthwise_conv3_matches_xla():
    """Both pallas depthwise formulations (pipelined 3-z-ref and manual-DMA
    ring) must match lax grouped conv, stride 1 SAME. These kernels are a
    measured NEGATIVE result on the bench chip (PERF.md "Negative results":
    XLA's grouped conv wins at the serving shapes) and are kept unwired as
    the experimental record — correctness is still pinned here."""
    from jax import lax

    from fissure_segmentation_tpu.ops.pallas.depthwise import (
        depthwise_conv3, depthwise_conv3_ring)

    rng = jax.random.PRNGKey(0)
    for shape, th in (((1, 6, 16, 16, 8), 8), ((2, 5, 32, 8, 5), 8)):
        c = shape[-1]
        x = jax.random.normal(rng, shape, jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, c),
                              jnp.float32)
        ref = lax.conv_general_dilated(
            x, w.reshape(3, 3, 3, 1, c), (1, 1, 1), "SAME",
            feature_group_count=c,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        np.testing.assert_allclose(depthwise_conv3(x, w), ref,
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(depthwise_conv3_ring(x, w, th=th), ref,
                                   atol=1e-4, rtol=1e-4)
