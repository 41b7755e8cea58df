"""Spectral-PSR mesh-quality bound: grid_res x point-noise sweep (SURVEY
hard-part #3; VERDICT r2 item 6).

The reference regularizes fissure point clouds with octree Poisson
reconstruction at depth 6 (data_processing/surface_fitting.py:87); this
build substitutes the spectral PSR + marching tetrahedra
(postprocess/surface_fitting.py) at grid_res=64^3. Open3D is unavailable
here, so instead of mesh-vs-mesh parity the sweep bounds the error
ABSOLUTELY: fit analytic synthetic fissure sheets (data/synthetic.py
height fields, the same family the E2E accuracy artifact uses) from noisy
point samples and report ASSD between the fitted mesh and the true surface.

Protocol per cell: label-1 (LOF) surface in a 256^3 volume, 4000 sampled
points (keypoint-like density) + isotropic Gaussian noise sigma voxels,
pointcloud_surface_fitting at grid_res in {32, 64, 128}, ASSD between 4000
fitted-mesh samples and 20000 dense true-surface samples (unit spacing:
voxels == mm). Mean over 3 surface seeds.

Run (CPU is fine): python scripts/prof/psr_quality_sweep.py
"""
import sys

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.data.synthetic import (_FISSURES,
                                                     _surface_params,
                                                     sample_fissure_surface)
from fissure_segmentation_tpu.metrics import mesh_metrics_from_point_sets
from fissure_segmentation_tpu.ops.marching import sample_points_on_triangles
from fissure_segmentation_tpu.postprocess.surface_fitting import \
    pointcloud_surface_fitting

SHAPE = (256, 256, 256)
N_POINTS = 4000
N_GT = 20000
SEEDS = (0, 1, 2)
GRID_RES = (32, 64, 128)
SIGMAS = (0.0, 0.5, 1.0, 2.0)
LABEL = 1
SCALE = np.array(SHAPE[::-1], np.float32) - 1  # [0,1]^3 -> world xyz


def _analytic_distance(params: dict, pts_world: np.ndarray) -> np.ndarray:
    """Exact-ish point-to-surface distance for the height field
    z(x, y) = z0 + a*dy + b*dx + qx*dx^2 + qy*dy^2 (data/synthetic.py:47):
    vertical residual projected onto the surface normal — first-order exact,
    and free of any point-sampling floor."""
    from fissure_segmentation_tpu.data.synthetic import _LUNGS, _surface_z
    p = params[LABEL]
    lung = _FISSURES[LABEL][0]
    cx = _LUNGS[lung][0][0]
    n = pts_world / SCALE                      # back to [0,1]^3 xyz
    x, y, z = n[:, 0], n[:, 1], n[:, 2]
    f = _surface_z(p, x, y, cx)
    fx = p["b"] + 2 * p["qx"] * (x - cx)
    fy = p["a"] + 2 * p["qy"] * (y - 0.5)
    # normalized-coord residual -> world: all axes share SCALE here (cube)
    return np.abs(z - f) / np.sqrt(1 + fx ** 2 + fy ** 2) * SCALE[2]


def one_cell(seed: int, res: int, sigma: float):
    rng = np.random.default_rng(seed)
    params = {lbl: _surface_params(rng, z0, sl)
              for lbl, (_, z0, sl) in _FISSURES.items()}
    pts = sample_fissure_surface(params, LABEL, N_POINTS, rng) * SCALE
    pts = pts + rng.normal(0, sigma, pts.shape)
    gt = sample_fissure_surface(params, LABEL, N_GT,
                                np.random.default_rng(seed + 100)) * SCALE
    # triangle budget scales with the crossing-cell count ~ res^2
    max_tris = {32: 6000, 64: 24000, 128: 96000}[res]
    tris, valid = pointcloud_surface_fitting(
        pts.astype(np.float32), SHAPE, grid_res=(res,) * 3,
        max_tris=max_tris, right=False, center_x=SHAPE[2] / 2)
    assert valid.any(), f"empty mesh at res={res} sigma={sigma}"
    samples = sample_points_on_triangles(
        jax.random.PRNGKey(seed), jnp.asarray(tris), jnp.asarray(valid), 4000)
    assd, sdsd, hd, hd95 = mesh_metrics_from_point_sets(
        samples, jnp.asarray(gt, jnp.float32))
    return float(assd), float(_analytic_distance(params,
                                                 np.asarray(samples)).mean())


def sampling_floor(seed: int) -> float:
    """Symmetric sampled ASSD between two independent sample sets of the
    TRUE surface (4000 vs 20000 pts) — the metric's own floor at the sweep's
    sampling density; subtract nothing, just read the table against it."""
    rng = np.random.default_rng(seed)
    params = {lbl: _surface_params(rng, z0, sl)
              for lbl, (_, z0, sl) in _FISSURES.items()}
    a = sample_fissure_surface(params, LABEL, N_POINTS,
                               np.random.default_rng(seed + 50)) * SCALE
    gt = sample_fissure_surface(params, LABEL, N_GT,
                                np.random.default_rng(seed + 100)) * SCALE
    assd, *_ = mesh_metrics_from_point_sets(jnp.asarray(a, jnp.float32),
                                            jnp.asarray(gt, jnp.float32))
    return float(assd)


def main():
    floor = [sampling_floor(s) for s in SEEDS]
    print(f"sampled-ASSD floor (true surface vs itself, 4k/20k samples): "
          f"{np.mean(floor):.2f} ± {np.std(floor):.2f} mm")
    print()
    print("| grid_res | " + " | ".join(f"sigma={s}" for s in SIGMAS) + " |")
    print("|---" * (len(SIGMAS) + 1) + "|")
    results = {}
    for res in GRID_RES:
        row = []
        for sigma in SIGMAS:
            cells = [one_cell(seed, res, sigma) for seed in SEEDS]
            assd = [c[0] for c in cells]
            ana = [c[1] for c in cells]
            results[(res, sigma)] = (np.mean(assd), np.mean(ana))
            row.append(f"{np.mean(assd):.2f} / {np.mean(ana):.2f}")
            print(f"  res={res:3d} sigma={sigma}: sampled ASSD "
                  f"{np.mean(assd):.3f} ± {np.std(assd):.3f}, analytic "
                  f"{np.mean(ana):.3f} ± {np.std(ana):.3f} mm",
                  file=sys.stderr, flush=True)
        print(f"| {res}^3 | " + " | ".join(row) + " |", flush=True)
    print("\ncells: sampled symmetric ASSD / analytic point-to-surface "
          "distance, mm (mean over 3 surfaces)")
    return results


if __name__ == "__main__":
    main()
