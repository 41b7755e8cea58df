"""Attribute the DPSRNet2 marching/sampling block (VERDICT r4 item 4, r5).

prof_dpsrnet2.py measured m_mt (lax.map MT + categorical sampling, fwd+bwd)
at 593.7 ms and the first batched rewrite m_mtb at 739.7 ms. This script
separates MT-core from sampling and old sampling from inverse-CDF:

  p_map_nosample   lax.map marching_tetrahedra only, f+b
  p_bat_nosample   marching_tetrahedra_batched only, f+b
  p_sample_cdf     vmapped inverse-CDF sampling on fixed tris, f+b
  p_sample_cat     vmapped categorical sampling (old), f+b
  p_map_cdf        lax.map MT + inverse-CDF sampling, f+b (the m_mt config
                   with the new sampler)
  p_bat_cdf        batched MT + inverse-CDF sampling, f+b

Shapes: 24 instances x 128^3, max_tris 24000, S=2048 (bench config).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(min_compile_secs=1.0)

from fissure_segmentation_tpu.ops.marching import (
    marching_tetrahedra, marching_tetrahedra_batched,
    sample_points_on_triangles)

BI, RES, MAX_TRIS, S, REPS = 24, (128, 128, 128), 24000, 2048, 2


def log(*a):
    print(*a, flush=True)


def timeit(fn, repeats=3):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chained(body, x0):
    @jax.jit
    def run(c0, x0):
        def step(c, i):
            return body(x0 * (1.0 + 1e-12 * c), i) * 1e-20, None
        c, _ = jax.lax.scan(step, c0, jnp.arange(REPS, dtype=jnp.float32))
        return c
    float(run(jnp.float32(0), x0))
    return timeit(lambda: float(run(jnp.float32(0), x0))) / REPS


zz = jnp.arange(RES[0], dtype=jnp.float32)[:, None, None]
yy = jnp.arange(RES[1], dtype=jnp.float32)[None, :, None]
xx = jnp.arange(RES[2], dtype=jnp.float32)[None, None, :]
phis = jnp.stack([
    (zz - (60.0 + 8 * jnp.sin(xx / 9.0 + c) + 6 * jnp.cos(yy / 7.0 + c)))
    / RES[0] for c in range(BI)])
keys = jax.random.split(jax.random.PRNGKey(6), BI)

STAGES = set(os.environ.get(
    "FSEG_STAGES",
    "map_nosample,bat_nosample,sample_cdf,sample_cat,map_cdf,bat_cdf"
).split(","))


def body_map_nosample(p_, i):
    def loss(p):
        def one(phi):
            t, v, _ = marching_tetrahedra(phi, max_tris=MAX_TRIS)
            return jnp.sum(jnp.where(v[:, None, None], t, 0.0))
        return jnp.sum(jax.lax.map(one, p))
    l, g = jax.value_and_grad(loss)(p_)
    return l + jnp.sum(g) * 1e-12


def body_bat_nosample(p_, i):
    def loss(p):
        t, v, _ = marching_tetrahedra_batched(p, max_tris=MAX_TRIS)
        return jnp.sum(jnp.where(v[..., None, None], t, 0.0))
    l, g = jax.value_and_grad(loss)(p_)
    return l + jnp.sum(g) * 1e-12


if "map_nosample" in STAGES:
    log(f"p_map_nosample  {chained(body_map_nosample, phis)*1e3:8.1f} ms")
if "bat_nosample" in STAGES:
    log(f"p_bat_nosample  {chained(body_bat_nosample, phis)*1e3:8.1f} ms")

# fixed triangle soup for the sampling probes
tris0, tvalid0, _ = jax.jit(
    lambda p: marching_tetrahedra_batched(p, max_tris=MAX_TRIS))(phis)
tris0 = jax.block_until_ready(tris0)


def body_sample_cdf(t_, i):
    def loss(t):
        pts = jax.vmap(lambda k, tr, v: sample_points_on_triangles(
            k, tr, v, S))(keys, t, tvalid0)
        return jnp.sum(pts)
    l, g = jax.value_and_grad(loss)(t_)
    return l + jnp.sum(g) * 1e-12


def _sample_categorical(rng, tris, valid, n_samples):
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    area = 0.5 * jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)
    area = jnp.where(valid, area, 0.0)
    r_idx, r_uv = jax.random.split(rng)
    probs = area / jnp.maximum(area.sum(), 1e-12)
    idx = jax.random.categorical(r_idx, jnp.log(probs + 1e-30),
                                 shape=(n_samples,))
    uv = jax.random.uniform(r_uv, (n_samples, 2))
    u = jnp.sqrt(uv[:, :1])
    v = uv[:, 1:]
    w0, w1, w2 = 1 - u, u * (1 - v), u * v
    return w0 * a[idx] + w1 * b[idx] + w2 * c[idx]


def body_sample_cat(t_, i):
    def loss(t):
        pts = jax.vmap(lambda k, tr, v: _sample_categorical(
            k, tr, v, S))(keys, t, tvalid0)
        return jnp.sum(pts)
    l, g = jax.value_and_grad(loss)(t_)
    return l + jnp.sum(g) * 1e-12


if "sample_cdf" in STAGES:
    log(f"p_sample_cdf    {chained(body_sample_cdf, tris0)*1e3:8.1f} ms")
if "sample_cat" in STAGES:
    log(f"p_sample_cat    {chained(body_sample_cat, tris0)*1e3:8.1f} ms")


def body_map_cdf(p_, i):
    def loss(p):
        def one(args):
            phi, k_ = args
            t, v, _ = marching_tetrahedra(phi, max_tris=MAX_TRIS)
            return jnp.sum(sample_points_on_triangles(k_, t, v, S))
        return jnp.sum(jax.lax.map(one, (p, keys)))
    l, g = jax.value_and_grad(loss)(p_)
    return l + jnp.sum(g) * 1e-12


def body_bat_cdf(p_, i):
    def loss(p):
        t, v, _ = marching_tetrahedra_batched(p, max_tris=MAX_TRIS)
        pts = jax.vmap(lambda k, tr, vv: sample_points_on_triangles(
            k, tr, vv, S))(keys, t, v)
        return jnp.sum(pts)
    l, g = jax.value_and_grad(loss)(p_)
    return l + jnp.sum(g) * 1e-12


if "map_cdf" in STAGES:
    log(f"p_map_cdf       {chained(body_map_cdf, phis)*1e3:8.1f} ms")
if "bat_cdf" in STAGES:
    log(f"p_bat_cdf       {chained(body_bat_cdf, phis)*1e3:8.1f} ms")

log("DONE")


# ---- finer batched-path attribution (fwd-only / recon split) ----
def _candidates_batched(p):
    """pass 1+2+3 of marching_tetrahedra_batched, returning idx_buf."""
    from fissure_segmentation_tpu.ops import marching as M
    bn, d, h, w = p.shape
    cz, cy, cx = d - 1, h - 1, w - 1
    m = cz * cy * cx
    phi_ng = jax.lax.stop_gradient(p)
    ins = [(phi_ng[:, dz:dz + cz, dy:dy + cy, dx:dx + cx] < 0.0)
           .astype(jnp.int32) for dz, dy, dx in M._CORNERS]
    counts = jnp.zeros((bn, cz, cy, cx), jnp.int32)
    for t in range(6):
        n_in = (ins[M._TETS[t][0]] + ins[M._TETS[t][1]]
                + ins[M._TETS[t][2]] + ins[M._TETS[t][3]])
        counts += ((n_in >= 1) & (n_in <= 3)).astype(jnp.int32) \
            + (n_in == 2).astype(jnp.int32)
    return counts


def body_b_count(p_, i):
    return jnp.sum(_candidates_batched(p_)).astype(jnp.float32)


def body_b_cumsum(p_, i):
    counts = _candidates_batched(p_)
    fa = (counts > 0).reshape(counts.shape[0], -1)
    pos = jnp.cumsum(fa.astype(jnp.int32), axis=1) - 1
    return jnp.sum(pos[:, -1]).astype(jnp.float32)


def body_b_fwd(p_, i):
    t, v, _ = marching_tetrahedra_batched(p_, max_tris=MAX_TRIS)
    return jnp.sum(jnp.where(v[..., None, None], t, 0.0))


def body_map_fwd(p_, i):
    def one(phi):
        t, v, _ = marching_tetrahedra(phi, max_tris=MAX_TRIS)
        return jnp.sum(jnp.where(v[:, None, None], t, 0.0))
    return jnp.sum(jax.lax.map(one, p_))


if "b_count" in STAGES:
    log(f"b_count (pass1 fwd)          {chained(body_b_count, phis)*1e3:8.1f} ms")
if "b_cumsum" in STAGES:
    log(f"b_cumsum (pass1+cumsum fwd)  {chained(body_b_cumsum, phis)*1e3:8.1f} ms")
if "b_fwd" in STAGES:
    log(f"b_fwd (batched MT fwd only)  {chained(body_b_fwd, phis)*1e3:8.1f} ms")
if "map_fwd" in STAGES:
    log(f"map_fwd (lax.map MT fwd only){chained(body_map_fwd, phis)*1e3:8.1f} ms")
log("DONE2")


# ---- hybrid (batched phase-1, mapped phase-2) + CDF sampling ----
def body_hyb_cdf(p_, i):
    from fissure_segmentation_tpu.ops.marching import \
        marching_tetrahedra_hybrid

    def loss(p):
        t, v, _ = marching_tetrahedra_hybrid(p, max_tris=MAX_TRIS)
        pts = jax.vmap(lambda k, tr, vv: sample_points_on_triangles(
            k, tr, vv, S))(keys, t, v)
        return jnp.sum(pts)
    l, g = jax.value_and_grad(loss)(p_)
    return l + jnp.sum(g) * 1e-12


if "hyb_cdf" in STAGES:
    log(f"p_hyb_cdf       {chained(body_hyb_cdf, phis)*1e3:8.1f} ms")
log("DONE3")


# ---- split of the current per-instance map: candidates-only vs full ----
def body_map_cand(p_, i):
    from fissure_segmentation_tpu.ops.marching import _marching_candidates

    def one(phi):
        tvalid, n_tris, idx_buf, _ = _marching_candidates(
            phi, MAX_TRIS, 0.0, None)
        return jnp.sum(idx_buf) + n_tris
    return jnp.sum(jax.lax.map(one, p_)).astype(jnp.float32)


if "map_cand" in STAGES:
    log(f"map_cand (candidates only, fwd) {chained(body_map_cand, phis)*1e3:8.1f} ms")
if "map_nosample2" in STAGES:
    log(f"map_nosample2 (current code f+b){chained(body_map_nosample, phis)*1e3:8.1f} ms")
log("DONE4")
