"""Tests for the native C++ host-runtime layer (fissure_segmentation_tpu.native).

Each kernel is validated against an independent reference implementation
(scipy.ndimage morphology / the device XLA point->mesh distance / dense
barycentric sampling).
"""
import numpy as np
import pytest

from fissure_segmentation_tpu import native


def test_native_builds():
    assert native.available(), "native C++ library failed to compile/load"


def test_cc_label_matches_scipy():
    from scipy import ndimage
    rng = np.random.default_rng(0)
    g = (rng.random((30, 40, 35)) > 0.72).astype(np.uint8)
    lab, n = native.cc_label_3d(g)
    lab_ref, n_ref = ndimage.label(g, structure=np.ones((3, 3, 3)))
    assert n == n_ref
    # partitions must agree up to renumbering: mapping both ways is a bijection
    pairs = np.unique(np.stack([lab.ravel(), lab_ref.ravel()]), axis=1)
    assert pairs.shape[1] == n + 1  # every label maps to exactly one ref label
    assert len(np.unique(pairs[0])) == n + 1
    assert len(np.unique(pairs[1])) == n + 1


def test_cc_label_empty_and_full():
    z = np.zeros((5, 5, 5), np.uint8)
    lab, n = native.cc_label_3d(z)
    assert n == 0 and not lab.any()
    f = np.ones((5, 5, 5), np.uint8)
    lab, n = native.cc_label_3d(f)
    assert n == 1 and (lab == 1).all()


def test_binary_dilate_matches_scipy():
    from scipy import ndimage
    rng = np.random.default_rng(1)
    g = (rng.random((20, 25, 30)) > 0.9).astype(np.uint8)
    for iters in (1, 3):
        got = native.binary_dilate_3d(g, iters)
        ref = ndimage.binary_dilation(g, iterations=iters).astype(np.uint8)
        np.testing.assert_array_equal(got, ref)


def _tri_sq_brute(p, a, b, c, n=400):
    u = np.linspace(0, 1, n)
    uu, vv = np.meshgrid(u, u)
    m = uu + vv <= 1
    uu, vv = uu[m], vv[m]
    pts = (a[None] * (1 - uu - vv)[:, None] + b[None] * uu[:, None]
           + c[None] * vv[:, None])
    return ((pts - p[None]) ** 2).sum(1).min()


def test_point_mesh_distance_single_triangles():
    rng = np.random.default_rng(2)
    for _ in range(10):
        verts = rng.random((3, 3)).astype(np.float32) * 10
        qs = (rng.random((8, 3)).astype(np.float32) * 14 - 2)
        d = native.point_mesh_distance(verts, np.array([[0, 1, 2]], np.int32),
                                       qs)
        ref = np.array([np.sqrt(_tri_sq_brute(q.astype(np.float64),
                                              *verts.astype(np.float64)))
                        for q in qs])
        np.testing.assert_allclose(d, ref, atol=5e-3)


def test_point_mesh_distance_bvh_vs_exhaustive():
    rng = np.random.default_rng(3)
    verts = rng.random((120, 3)).astype(np.float32) * 30
    tris = rng.integers(0, 120, (200, 3)).astype(np.int32)
    qs = rng.random((150, 3)).astype(np.float32) * 36 - 3
    d_bvh = native.point_mesh_distance(verts, tris, qs)
    d_ref = np.full(len(qs), np.inf, np.float32)
    for t in range(len(tris)):
        d_ref = np.minimum(
            d_ref, native.point_mesh_distance(verts, tris[t:t + 1], qs))
    np.testing.assert_allclose(d_bvh, d_ref, rtol=1e-6, atol=1e-6)


def test_point_mesh_distance_empty_mesh():
    d = native.point_mesh_distance(np.zeros((0, 3), np.float32),
                                   np.zeros((0, 3), np.int32),
                                   np.zeros((4, 3), np.float32))
    assert np.isinf(d).all()


def test_voxelize_planar_triangle():
    # triangle in the z=2.5 plane -> only z-slice 2 voxels, exact cover
    tri = np.array([[[1.2, 1.2, 2.5], [8.7, 1.2, 2.5], [1.2, 8.7, 2.5]]],
                   np.float32)
    out = native.voxelize_triangles(tri, None, (12, 12, 12), 3)
    zs = np.unique(np.argwhere(out)[:, 0])
    assert list(zs) == [2]
    assert set(np.unique(out)) == {0, 3}
    # every sampled surface point must land in a marked voxel
    rng = np.random.default_rng(4)
    u = rng.random(2000)
    v = rng.random(2000) * (1 - u)
    pts = (tri[0, 0][None] * (1 - u - v)[:, None] + tri[0, 1][None]
           * u[:, None] + tri[0, 2][None] * v[:, None])
    idx = np.floor(pts[:, ::-1]).astype(int)
    assert out[idx[:, 0], idx[:, 1], idx[:, 2]].all()


def test_voxelize_respects_valid_mask():
    tri = np.array([[[1, 1, 1.5], [3, 1, 1.5], [1, 3, 1.5]],
                    [[5, 5, 5.5], [7, 5, 5.5], [5, 7, 5.5]]], np.float32)
    out = native.voxelize_triangles(tri, np.array([True, False]), (10, 10, 10),
                                    1)
    assert out[1].any() and not out[5].any()


def test_keep_largest_component_uses_native():
    from fissure_segmentation_tpu.postprocess.surface_fitting import \
        keep_largest_component
    g = np.zeros((10, 10, 20), bool)
    g[2:4, 2:4, 2:4] = True      # small left blob
    g[5:9, 5:9, 12:18] = True    # big right blob
    out = keep_largest_component(g)
    assert out[6, 6, 14] and not out[2, 2, 2]
    # left/right preference: prefer left half (right=False => x < center ok)
    out = keep_largest_component(g, right=True, center_x=10.0)
    # the big blob sits at x>=12 (wrong half for right fissures whose com
    # must be left of center per the reference's scoring) -> small blob wins
    assert out[2, 2, 2] and not out[6, 6, 14]


def test_mesh_metrics_host_matches_device():
    import jax.numpy as jnp
    from fissure_segmentation_tpu.metrics import mesh_metrics_from_point_sets
    rng = np.random.default_rng(5)
    pv = rng.random((40, 3)).astype(np.float32) * 10
    pt = rng.integers(0, 40, (60, 3)).astype(np.int32)
    gv = rng.random((35, 3)).astype(np.float32) * 10
    gt = rng.integers(0, 35, (50, 3)).astype(np.int32)
    host = mesh_metrics_from_point_sets(jnp.asarray(pv), jnp.asarray(gv),
                                        jnp.asarray(pt), jnp.asarray(gt),
                                        host=True)
    dev = mesh_metrics_from_point_sets(jnp.asarray(pv), jnp.asarray(gv),
                                       jnp.asarray(pt), jnp.asarray(gt),
                                       host=False)
    np.testing.assert_allclose(np.asarray(host), np.asarray(dev), rtol=1e-2,
                               atol=5e-3)
