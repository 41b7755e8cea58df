"""Sub-stage split of the serving PSR+marching-tets block, plus a cProfile
of the host mesh filter. Each device stage is a separate jit (pays one
dispatch RTT) — use ratios, not absolutes.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/prof/prof_psr_split.py
"""
import cProfile
import functools
import io
import pstats
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fissure_segmentation_tpu.ops.dpsr import dpsr_forward
from fissure_segmentation_tpu.ops.marching import (marching_tetrahedra,
                                                   marching_tetrahedra_packed)
from fissure_segmentation_tpu.ops.normals import estimate_pointcloud_normals
from fissure_segmentation_tpu.postprocess.surface_fitting import (
    _bbox_cell_mask, _decode_packed_mesh, _host_mesh_filter)

GRID = (64, 64, 64)
N = 20000
rng = np.random.default_rng(0)

# synthetic 3-class cloud: 3 tilted sheets, ~6.6k pts each, in [-1, 1]^3 zyx
pts = np.zeros((N, 3), np.float32)
cls = np.repeat(np.arange(3), [6666, 6667, 6667])
for c in range(3):
    m = cls == c
    n = int(m.sum())
    yx = rng.uniform(-0.85, 0.85, (n, 2)).astype(np.float32)
    z = (-0.3 + 0.3 * c + 0.15 * yx[:, 0] + 0.05 * yx[:, 1]
         + rng.normal(0, 0.01, n)).astype(np.float32)
    pts[m] = np.stack([z, yx[:, 0], yx[:, 1]], -1)
pts_grid = jnp.asarray(pts)
class_valid = jnp.asarray(np.stack([cls == c for c in range(3)]))


def timeit(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


@jax.jit
def stage_normals(pts_grid, valids):
    def one(v):
        return estimate_pointcloud_normals(pts_grid[None], k=30,
                                           mask=v[None])[0]
    return jax.vmap(one)(valids)


@jax.jit
def stage_dpsr(pts_grid, normals, valids):
    def one(nrm, v):
        w = v[:, None].astype(pts_grid.dtype)
        return dpsr_forward(pts_grid[None], (nrm * w)[None], res=GRID,
                            sig=4.0, point_weights=v[None])[0]
    return jax.vmap(one)(normals, valids)


@functools.partial(jax.jit, static_argnames=("packed",))
def stage_mt(phis, pts_grid, valids, packed=True):
    masks = jax.vmap(lambda v: _bbox_cell_mask(pts_grid, v, GRID))(valids)
    if packed:
        return jax.vmap(lambda p, m: marching_tetrahedra_packed(
            p, max_tris=24000, max_verts=16384, cell_mask=m))(phis, masks)
    return jax.vmap(lambda p, m: marching_tetrahedra(
        p, max_tris=24000, cell_mask=m))(phis, masks)


def force(x):
    np.asarray(jax.tree_util.tree_leaves(x)[-1])
    return x


nrm = force(stage_normals(pts_grid, class_valid))
t_n = timeit(lambda: force(stage_normals(pts_grid, class_valid)))
phis = force(stage_dpsr(pts_grid, nrm, class_valid))
t_d = timeit(lambda: force(stage_dpsr(pts_grid, nrm, class_valid)))
po = force(stage_mt(phis, pts_grid, class_valid, packed=True))
t_mp = timeit(lambda: force(stage_mt(phis, pts_grid, class_valid, packed=True)))
so = force(stage_mt(phis, pts_grid, class_valid, packed=False))
t_ms = timeit(lambda: force(stage_mt(phis, pts_grid, class_valid, packed=False)))

print(f"normals(3x20k,k=30) {t_n*1e3:6.1f} | dpsr(3x64^3) {t_d*1e3:6.1f} | "
      f"mt packed {t_mp*1e3:6.1f} | mt soup {t_ms*1e3:6.1f} ms", flush=True)

# ---- host filter profile ----
idx, vkey, vfrac_q, n_tris, n_verts = (np.asarray(a) for a in po)
phis_np = np.asarray(phis)
world = (np.asarray(pts)[:, ::-1] + 1) / 2 * 255.0  # fake world xyz

i = 2
tris_i = _decode_packed_mesh(idx[i], vkey[i], vfrac_q[i], int(n_tris[i]),
                             int(n_verts[i]), GRID)
pts_c = world[np.asarray(class_valid[i])]

pr = cProfile.Profile()
pr.enable()
for _ in range(5):
    _host_mesh_filter(phis_np[i] < 0, tris_i, np.ones(len(tris_i), bool),
                      pts_c, (256, 256, 256), GRID, None, 1, True, 128.0,
                      True)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(12)
print(s.getvalue(), flush=True)
