"""Marching-tetrahedra candidate-selection variants, measured on-chip.

Round-4 result (VERDICT item 1): the serving MT stage cost ~64 ms device
time (78 ms incl. RTT share) because (a) the former 8-step slab lax.scan
serialized a batched scatter per step and (b) vmap over the 3 classes
lowers the compaction scatter/gather to slow batched forms. The shipped
implementation (ops/marching.py) is count-then-emit with the class loop
UNROLLED in surface_fitting._batched_psr_mc*.

Timing methodology: chained data-dependent iterations inside ONE jit
(PERF.md Methodology) — a bare per-call wall clock over the axon tunnel
carries a ~39 ms dispatch RTT that swamps the kernel.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/prof/prof_mt_variants.py
"""
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
MAX_TRIS = 24000
N = 20000
REPS = 8
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


@jax.jit
def make_inputs(pts_grid, valids):
    def one(v):
        nrm = estimate_pointcloud_normals(pts_grid[None], k=30, mask=v[None])[0]
        w = v[:, None].astype(pts_grid.dtype)
        phi = dpsr_forward(pts_grid[None], (nrm * w)[None], res=GRID, sig=4.0,
                           point_weights=v[None])[0]
        return phi, _bbox_cell_mask(pts_grid, v, GRID)
    return jax.vmap(one)(valids)


def mt3_unrolled(phis, masks):
    outs = [marching_tetrahedra(phis[i], max_tris=MAX_TRIS, cell_mask=masks[i])
            for i in range(3)]
    return (jnp.stack([o[0] for o in outs]), jnp.stack([o[1] for o in outs]),
            jnp.stack([o[2] for o in outs]))


def mt3_vmap(phis, masks):
    return jax.vmap(lambda p, m: marching_tetrahedra(
        p, max_tris=MAX_TRIS, cell_mask=m))(phis, masks)


def mt3_packed_unrolled(phis, masks):
    outs = [marching_tetrahedra_packed(phis[i], max_tris=MAX_TRIS,
                                       max_verts=16384, cell_mask=masks[i])
            for i in range(3)]
    return tuple(jnp.stack([o[j] for o in outs]) for j in range(5))


def chained(fn, phis, masks, reps=REPS):
    """REPS data-dependent iterations in one jit, returns s/iter."""

    @jax.jit
    def run(c0):
        def body(c, _):
            out = fn(phis * (1.0 + 1e-12 * c), masks)
            leaf = jax.tree_util.tree_leaves(out)[-1]
            return jnp.sum(leaf).astype(jnp.float32) * 1e-20, None
        c, _ = jax.lax.scan(body, c0, None, length=reps)
        return c

    float(run(jnp.float32(0)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(jnp.float32(0)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


phis, masks = make_inputs(pts_grid, class_valid)
jax.block_until_ready(phis)

# parity vmap vs unrolled
a = [np.asarray(x) for x in jax.jit(mt3_unrolled)(phis, masks)]
b = [np.asarray(x) for x in jax.jit(mt3_vmap)(phis, masks)]
assert np.array_equal(a[2], b[2]) and np.array_equal(a[1], b[1])
assert np.allclose(a[0], b[0], atol=1e-6)
print(f"parity OK, n_tris={a[2]}", flush=True)

for name, fn in [("mt3_unrolled", mt3_unrolled), ("mt3_vmap", mt3_vmap),
                 ("mt3_packed_unrolled", mt3_packed_unrolled)]:
    t = chained(fn, phis, masks)
    print(f"{name:22s} {t * 1e3:7.2f} ms", flush=True)
