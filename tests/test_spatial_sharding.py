"""Spatial (z-slab) sharding with halo exchange (parallel/spatial.py):
collective primitives + exact parity with the unsharded sliding window."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fissure_segmentation_tpu.parallel import make_mesh
from fissure_segmentation_tpu.parallel.spatial import (
    halo_exchange, halo_reduce, sharded_predict_all_patches)


def _mesh(n=4):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return make_mesh(("data",), devices=jax.devices()[:n])


def test_halo_exchange_roundtrip():
    mesh = _mesh(4)
    x = jnp.arange(32 * 3, dtype=jnp.float32).reshape(32, 3)
    halo = 2

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("data", None),
                       out_specs=P("data", None))
    def f(xl):
        return halo_exchange(xl, halo, "data")[halo:-halo]

    # exchange then crop is the identity
    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(x))

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("data", None),
                       out_specs=P("data", None))
    def g(xl):
        return halo_exchange(xl, halo, "data")[:halo]

    # first-halo rows = previous device's last rows (edge-replicated at 0)
    out = np.asarray(g(x)).reshape(4, halo, 3)
    np.testing.assert_array_equal(out[1], np.asarray(x[8 - halo:8]))
    np.testing.assert_array_equal(out[0], np.broadcast_to(np.asarray(x[:1]),
                                                          (halo, 3)))


def test_halo_reduce_is_exchange_transpose():
    """sum(halo_reduce(y_ext) * x) == sum(y_ext * halo_exchange(x)) —
    the defining adjoint property, which also guarantees accumulation
    correctness."""
    mesh = _mesh(4)
    rng = np.random.default_rng(0)
    halo = 2
    x = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    y_np = rng.normal(size=(4 * (8 + 2 * halo), 3)).astype(np.float32)
    # edge replication at the mesh boundary has no transpose counterpart
    # (the sliding window never accumulates into those rows): zero device
    # 0's top halo and the last device's bottom halo
    y_np = y_np.reshape(4, 8 + 2 * halo, 3)
    y_np[0, :halo] = 0
    y_np[-1, -halo:] = 0
    y = jnp.asarray(y_np.reshape(-1, 3))

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("data", None), P("data", None)),
                       out_specs=P("data", None))
    def fwd(xl, yl):
        ext = halo_exchange(xl, halo, "data")
        return jnp.sum(ext * yl, keepdims=True, axis=(0, 1))

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("data", None), P("data", None)),
                       out_specs=P("data", None))
    def bwd(xl, yl):
        red = halo_reduce(yl, halo, "data")
        return jnp.sum(red * xl, keepdims=True, axis=(0, 1))

    lhs = float(np.asarray(fwd(x, y)).sum())
    rhs = float(np.asarray(bwd(x, y)).sum())
    assert abs(lhs - rhs) < 1e-3 * max(1.0, abs(lhs)), (lhs, rhs)


@pytest.mark.slow
def test_sharded_sliding_window_matches_unsharded():
    from fissure_segmentation_tpu.models import MobileNetASPP, predict_all_patches
    mesh = _mesh(4)
    model = MobileNetASPP(num_classes=3, patch_size=(8, 12, 12))
    img = jax.random.normal(jax.random.PRNGKey(0), (24, 20, 20))
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 8, 8, 8, 1)), train=False)

    ref = predict_all_patches(model.apply, variables, img, 3,
                              patch_size=(8, 12, 12), min_overlap=0.4)
    out = sharded_predict_all_patches(model.apply, variables, img, 3, mesh,
                                      patch_size=(8, 12, 12), min_overlap=0.4)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_halo_down_pair_adjoint_and_coverage():
    mesh = _mesh(4)
    rng = np.random.default_rng(1)
    slab, hops = 8, 2
    x = jnp.asarray(rng.normal(size=(4 * slab, 3)).astype(np.float32))

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("data", None),
                       out_specs=P("data", None))
    def down(xl):
        from fissure_segmentation_tpu.parallel.spatial import halo_exchange_down
        return halo_exchange_down(xl, hops, "data")

    ext = np.asarray(down(x)).reshape(4, (hops + 1) * slab, 3)
    xg = np.asarray(x).reshape(4, slab, 3)
    # device 0 sees its own slab then slabs of devices 1 and 2
    np.testing.assert_array_equal(ext[0, :slab], xg[0])
    np.testing.assert_array_equal(ext[0, slab:2 * slab], xg[1])
    np.testing.assert_array_equal(ext[0, 2 * slab:], xg[2])
    # last device edge-replicates its final row beyond the mesh
    np.testing.assert_array_equal(ext[3, slab:],
                                  np.broadcast_to(xg[3][-1:], (2 * slab, 3)))

    # reduce: contributions land on the owning device
    y = jnp.asarray(rng.normal(size=(4 * (hops + 1) * slab, 3)).astype(np.float32))

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("data", None),
                       out_specs=P("data", None))
    def red(yl):
        from fissure_segmentation_tpu.parallel.spatial import halo_reduce_down
        return halo_reduce_down(yl, hops, slab, "data")

    got = np.asarray(red(y)).reshape(4, slab, 3)
    yg = np.asarray(y).reshape(4, hops + 1, slab, 3)
    for d in range(4):
        expect = yg[d, 0].copy()
        for j in range(1, hops + 1):
            if d - j >= 0:
                expect += yg[d - j, j]
        np.testing.assert_allclose(got[d], expect, atol=1e-6)
