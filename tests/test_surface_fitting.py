import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.data.synthetic import (gt_surface_points,
                                                     make_synthetic_case)
from fissure_segmentation_tpu.metrics import mesh_metrics_from_point_sets
from fissure_segmentation_tpu.ops.marching import sample_points_on_triangles
from fissure_segmentation_tpu.ops.normals import estimate_pointcloud_normals
from fissure_segmentation_tpu.postprocess import (mesh_to_labelmap,
                                                  pointcloud_surface_fitting)
from fissure_segmentation_tpu.utils.coords import kpts_to_world
import pytest


def test_normal_estimation_on_plane(rng):
    # points on z = 0.5x + 0.2y -> normal prop to (-0.5, -0.2, 1)/|.|
    xy = rng.uniform(-1, 1, (500, 2)).astype(np.float32)
    z = 0.5 * xy[:, 0] + 0.2 * xy[:, 1]
    pts = jnp.asarray(np.stack([xy[:, 0], xy[:, 1], z], -1))
    n = np.asarray(estimate_pointcloud_normals(pts, k=20))
    expected = np.array([-0.5, -0.2, 1.0])
    expected /= np.linalg.norm(expected)
    cos = n @ expected
    # globally-oriented: all normals near +expected
    assert (cos > 0.98).mean() > 0.95, cos.mean()


@pytest.mark.slow
def test_surface_fitting_on_synthetic_fissure():
    case = make_synthetic_case(3, n_points=4000, with_feature=False)
    shape = case["shape"]
    # take the LOF points (grid coords) -> world
    lof = case["coords"][case["labels"] == 1]
    pts_world = np.asarray(kpts_to_world(jnp.asarray(lof), shape))

    tris, valid = pointcloud_surface_fitting(pts_world, shape, grid_res=(64, 64, 64),
                                             right=False, center_x=shape[2] / 2)
    assert valid.sum() > 100

    # fitted surface must be close to the dense GT surface (ASSD in voxels)
    import jax
    pred_pts = np.asarray(sample_points_on_triangles(
        jax.random.PRNGKey(0), jnp.asarray(tris), jnp.asarray(valid), 4000))
    gt_grid = gt_surface_points(case, 1, n=4000)
    gt_world = np.asarray(kpts_to_world(jnp.asarray(gt_grid), shape))
    assd, sdsd, hd, hd95 = mesh_metrics_from_point_sets(
        jnp.asarray(pred_pts), jnp.asarray(gt_world))
    print("surface fit ASSD:", float(assd), "HD95:", float(hd95))
    assert float(assd) < 3.0   # voxels (GT extends past the crop bbox edges)
    assert float(hd95) < 10.0

    # labelmap conversion
    lm = mesh_to_labelmap([(tris, valid)], shape, n_samples=10 ** 5)
    assert lm.sum() > 0
    occupied = np.argwhere(lm == 1)
    # labeled voxels near the fissure z-range
    assert occupied[:, 0].std() > 1.0


@pytest.mark.slow
def test_psr_mesh_quality_bound():
    """Pin the spectral-PSR accuracy bound measured by
    scripts/prof/psr_quality_sweep.py (PERF.md "Spectral-PSR mesh quality"):
    at the serving config (64^3 grid, the reference's octree-depth-6
    equivalent, surface_fitting.py:87) a synthetic analytic fissure sheet
    sampled with 1-voxel point noise reconstructs to < 0.5 mm mean analytic
    point-to-surface distance (sweep measured 0.20 ± 0.01)."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "prof"))
    try:
        from psr_quality_sweep import one_cell
    finally:
        sys.path.pop(0)
    sampled_assd, analytic = one_cell(seed=0, res=64, sigma=1.0)
    assert analytic < 0.5, analytic
    assert sampled_assd < 3.5, sampled_assd  # includes the ~0.6mm metric floor


def test_marching_tetrahedra_cell_mask():
    """cell_mask restricts extraction: masked cells emit no triangles, and
    the budget is spent inside the mask (the bbox-masked PSR callers depend
    on this to avoid z-order truncation of the real surface)."""
    import jax
    from fissure_segmentation_tpu.ops.marching import marching_tetrahedra

    z = jnp.linspace(-1, 1, 16)
    phi = jnp.broadcast_to(z[:, None, None], (16, 16, 16))  # plane at z=7.5
    full, fvalid, fn = marching_tetrahedra(phi, max_tris=4000)
    mask = jnp.zeros((15, 15, 15), bool).at[:, :8, :].set(True)
    half, hvalid, hn = marching_tetrahedra(phi, max_tris=4000, cell_mask=mask)
    assert int(hn) < int(fn) and int(hn) > 0
    # all surviving triangles lie in masked cells (y < 8)
    ys = np.asarray(half[np.asarray(hvalid)])[:, :, 1]
    assert ys.max() <= 8.0
    # empty mask -> no triangles
    _, zvalid, zn = marching_tetrahedra(
        phi, max_tris=4000, cell_mask=jnp.zeros((15, 15, 15), bool))
    assert int(zn) == 0 and not bool(zvalid.any())


def test_packed_marching_matches_plain():
    """marching_tetrahedra_packed + host decode reproduces the plain
    triangle soup exactly (same candidate order; coords within the uint16
    edge-fraction quantization), with V/T ~ 0.5 vertex sharing."""
    import jax
    from fissure_segmentation_tpu.ops.marching import (
        marching_tetrahedra, marching_tetrahedra_packed)
    from fissure_segmentation_tpu.postprocess.surface_fitting import \
        _decode_packed_mesh

    rng = np.random.default_rng(4)
    base = np.linspace(-1, 1, 24)[:, None, None]
    phi = jnp.asarray(base + 0.08 * rng.normal(size=(24, 24, 24)),
                      jnp.float32)
    tris, valid, n = marching_tetrahedra(phi, max_tris=9000)
    assert int(n) < 9000  # no truncation: budgets must cover the surface
    idx, vkey, vfrac, n_p, n_v = marching_tetrahedra_packed(
        phi, max_tris=9000, max_verts=6000)
    assert int(n) == int(n_p)
    dec = _decode_packed_mesh(np.asarray(idx), np.asarray(vkey),
                              np.asarray(vfrac), int(n), int(n_v),
                              (24, 24, 24))
    np.testing.assert_allclose(dec, np.asarray(tris[np.asarray(valid)]),
                               atol=2e-4)
    assert int(n_v) < 0.7 * int(n) * 3  # real vertex sharing happened
    # overflowed vertex budget is detected at decode time
    with pytest.raises(ValueError):
        _decode_packed_mesh(np.asarray(idx), np.asarray(vkey)[:8],
                            np.asarray(vfrac)[:8], int(n), int(n_v),
                            (24, 24, 24))


def test_batched_fit_matches_per_class():
    """fit_fissure_surfaces (one vmapped dispatch) must reproduce the
    per-class pointcloud_surface_fitting meshes."""
    import numpy as np
    import jax.numpy as jnp
    from fissure_segmentation_tpu.postprocess.surface_fitting import (
        fit_fissure_surfaces, pointcloud_surface_fitting)

    rng = np.random.default_rng(0)
    shape = (48, 48, 48)
    # two tilted plane-ish clouds
    def plane(z0, slope):
        xy = rng.uniform(8, 40, (500, 2)).astype(np.float32)
        z = z0 + slope * (xy[:, 0] - 24) / 24 + rng.normal(0, 0.2, 500)
        return np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)

    p1, p2 = plane(20, 3), plane(30, -2)
    pts = np.concatenate([p1, p2])
    cv = np.zeros((2, 1000), bool)
    cv[0, :500] = True
    cv[1, 500:] = True

    batched = fit_fissure_surfaces(pts, cv, shape, grid_res=(32, 32, 32),
                                   max_tris=8000)
    singles = [pointcloud_surface_fitting(p, shape, grid_res=(32, 32, 32),
                                          max_tris=8000) for p in (p1, p2)]
    for (tb, vb), (ts, vs) in zip(batched, singles):
        # batched path compacts valid triangles to the front
        assert vb.sum() == vs.sum()
        # uint16 fixed-point transfer encoding: 1/512-voxel quantization
        np.testing.assert_allclose(tb[vb], ts[vs], atol=5e-3)
