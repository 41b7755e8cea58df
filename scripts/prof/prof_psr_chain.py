"""Chained-scan (in-jit) cumulative timing of the serving PSR block.

Measures, with REPS data-dependent iterations inside ONE jit (carry injected
through the 240 kB point array — tiny vs the work), the cumulative cost of
  normals -> +dpsr -> +marching-tets -> +packed-encode
so successive differences give each sub-stage's true in-context cost.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/prof/prof_psr_chain.py
"""
import functools
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
from fissure_segmentation_tpu.postprocess.surface_fitting import _bbox_cell_mask

GRID = (64, 64, 64)
N = 20000
REPS = 6
rng = np.random.default_rng(0)

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


def block(p, stage):
    def one(v):
        nrm = estimate_pointcloud_normals(p[None], k=30, mask=v[None])[0]
        if stage == "normals":
            return jnp.sum(nrm)
        w = v[:, None].astype(p.dtype)
        phi = dpsr_forward(p[None], (nrm * w)[None], res=GRID, sig=4.0,
                           point_weights=v[None])[0]
        if stage == "dpsr":
            return jnp.sum(phi)
        m = _bbox_cell_mask(p, v, GRID)
        if stage == "mt":
            tris, tv, n = marching_tetrahedra(phi, max_tris=24000, cell_mask=m)
            return jnp.sum(tris) + n.astype(jnp.float32)
        idx, vkey, vfrac_q, n_tris, n_verts = marching_tetrahedra_packed(
            phi, max_tris=24000, max_verts=16384, cell_mask=m)
        return (jnp.sum(vfrac_q.astype(jnp.float32)) +
                n_tris.astype(jnp.float32) + jnp.sum(idx.astype(jnp.float32)))
    return jnp.sum(jax.vmap(one)(class_valid))


@functools.partial(jax.jit, static_argnames=("stage",))
def chained(stage):
    def body(c, i):
        return block(pts_grid * (1.0 + 1e-12 * c), stage) * 1e-20, None
    c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
    return c


prev = 0.0
for stage in ("normals", "dpsr", "mt", "packed"):
    float(chained(stage))  # compile + warm
    t = timeit(lambda: float(chained(stage))) / REPS
    print(f"{stage:8s} cumulative {t*1e3:7.2f} ms  (+{(t-prev)*1e3:6.2f})",
          flush=True)
    prev = t
