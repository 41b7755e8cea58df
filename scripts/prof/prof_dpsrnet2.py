"""DPSRNet2 train-step decomposition (VERDICT r4 item 4).

BENCH_r04: train_dpsrnet2_step_ms = 786.76 at batch 8 — the slowest
trainable family and the only bench row with no PERF.md stage table. This
script attributes the step to its stages with standalone fwd+bwd probes at
the exact bench shapes (B=8, N=1024, k=20, C=4 -> C'=3, res=128^3,
max_tris=24000, n_surface_samples=2048; bench.py:bench_family_steps):

  m_seg    DGCNN seg fwd+bwd (nnu loss)
  m_splat  splat_grid_sample fwd+bwd (probs -> (B, C', 128^3))
  m_gauss  3x gaussian_differentiation fwd+bwd (31-tap separable, 3 dims)
  m_psr    spectral_psr fwd+bwd on (B*C', 3, 128^3) (rfftn/irfftn pair)
  m_mt     lax.map marching_tetrahedra + surface sampling fwd+bwd over
           24 x 128^3 phi grids (the serialized per-(batch,class) loop)
  m_cham   chamfer(2048 x 2048) x 24 fwd+bwd
  full     the real dpsr loss step (same protocol as bench.py)

Each probe chains REPS data-dependent iterations in one jit and fetches a
scalar (PERF.md Methodology); times are min of 3 runs / REPS.
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

from fissure_segmentation_tpu.models import DPSRNet2
from fissure_segmentation_tpu.models.dgcnn import DGCNNSeg
from fissure_segmentation_tpu.ops.splat import splat_grid_sample
from fissure_segmentation_tpu.ops.dpsr import spectral_psr
from fissure_segmentation_tpu.ops.marching import (marching_tetrahedra,
                                                   sample_points_on_triangles)
from fissure_segmentation_tpu.utils.filters import gaussian_differentiation
from fissure_segmentation_tpu.losses.chamfer import chamfer_distance
from fissure_segmentation_tpu.losses.segmentation import nnu_loss

B, N, K, C = 8, 1024, 20, 4
RES = (128, 128, 128)
CP = C - 1
S = 2048
MAX_TRIS = 24000
REPS = 2


def log(*a):
    print(*a, flush=True)


def timeit(fn, repeats=3):
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def chained(body, x0):
    """REPS data-dependent body(x) -> scalar iterations in one jit.

    x0 is a jit ARGUMENT, not a closure constant: a captured 600 MB array
    gets serialized into the HLO and the axon remote-compile endpoint
    rejects the upload (HTTP 413). The per-iteration perturbation costs one
    elementwise pass over x0 (~10 ms at 128^3x24); probes carrying big
    payloads are therefore slight over-estimates (PERF.md Methodology)."""
    @jax.jit
    def run(c0, x0):
        def step(c, i):
            return body(x0 * (1.0 + 1e-12 * c), i) * 1e-20, None
        c, _ = jax.lax.scan(step, c0, jnp.arange(REPS, dtype=jnp.float32))
        return c
    float(run(jnp.float32(0), x0))  # compile + warm
    return timeit(lambda: float(run(jnp.float32(0), x0))) / REPS


STAGES = set(os.environ.get(
    "FSEG_STAGES", "seg,splat,gauss,psr,mt,cham,full").split(","))


key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (B, N, 3), jnp.float32, -0.9, 0.9)
y = jax.random.randint(jax.random.PRNGKey(1), (B, N), 0, C)
logits0 = jax.random.normal(jax.random.PRNGKey(2), (B, N, C))

# ---- m_seg: DGCNN fwd+bwd ----
seg = DGCNNSeg(k=K, in_features=3, num_classes=C, dynamic=False)
v = jax.jit(lambda r, a: seg.init(r, a, train=False))(jax.random.PRNGKey(3), x)


def seg_body(xi, i):
    def loss(p):
        lg, _ = seg.apply({"params": p, "batch_stats": v["batch_stats"]},
                          xi, train=True, mutable=["batch_stats"])
        l, _ = nnu_loss(lg, y)
        return l
    l, g = jax.value_and_grad(loss)(v["params"])
    return l + jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b), g, 0.0) * 1e-12


if "seg" in STAGES:
    t = chained(seg_body, x)
    log(f"m_seg   (DGCNN fwd+bwd)           {t*1e3:8.1f} ms")

# ---- m_splat: probs -> grid fwd+bwd ----
def splat_body(lg, i):
    def loss(lgi):
        probs = jax.nn.softmax(lgi, -1)[..., 1:]
        grid = splat_grid_sample(probs, jnp.clip(x, -1, 1), RES)
        return jnp.sum(grid * (1.0 + i * 0))
    l, g = jax.value_and_grad(loss)(lg)
    return l + jnp.sum(g) * 1e-12


if "splat" in STAGES:
    t = chained(splat_body, logits0)
    log(f"m_splat (splat fwd+bwd)           {t*1e3:8.1f} ms")

# ---- m_gauss: normal-field smoothing fwd+bwd ----
grid0 = jax.random.normal(jax.random.PRNGKey(4), (B, CP, *RES))


def gauss_body(gr, i):
    def loss(g_):
        grads = [gaussian_differentiation(g_, 10.0, order=1, dim=d,
                                          padding_mode="constant",
                                          truncate=1.5) for d in range(3)]
        return sum(jnp.sum(gg) for gg in grads)
    l, g = jax.value_and_grad(loss)(gr)
    return l + jnp.sum(g) * 1e-12


if "gauss" in STAGES:
    t = chained(gauss_body, grid0)
    log(f"m_gauss (3x gaussian_diff fwd+bwd){t*1e3:8.1f} ms")

# ---- m_psr: spectral solve fwd+bwd ----
normals0 = jax.random.normal(jax.random.PRNGKey(5), (B * CP, 3, *RES))
v_zyx = (jnp.clip(x, -1, 1)[..., ::-1] + 1.0) / 2.0
v_rep = jnp.repeat(v_zyx, CP, axis=0)


def psr_body(nf, i):
    def loss(n_):
        phi = spectral_psr(v_rep, n_, RES, 10.0, scale=True, shift=True)
        return jnp.sum(phi)
    l, g = jax.value_and_grad(loss)(nf)
    return l + jnp.sum(g) * 1e-12


if "psr" in STAGES:
    t = chained(psr_body, normals0)
    log(f"m_psr   (spectral_psr fwd+bwd)    {t*1e3:8.1f} ms")

# ---- m_mt: 24x marching tetrahedra + sampling fwd+bwd (lax.map) ----
# realistic phi: full sheets crossing the grid (budget-saturating load)
zz = jnp.arange(RES[0], dtype=jnp.float32)[:, None, None]
yy = jnp.arange(RES[1], dtype=jnp.float32)[None, :, None]
xx = jnp.arange(RES[2], dtype=jnp.float32)[None, None, :]
phis = jnp.stack([
    (zz - (60.0 + 8 * jnp.sin(xx / 9.0 + c) + 6 * jnp.cos(yy / 7.0 + c)))
    / RES[0] for c in range(B * CP)])
keys = jax.random.split(jax.random.PRNGKey(6), B * CP)


def mt_body(ph, i):
    def loss(p_):
        def extract(args):
            phi, k_ = args
            tris, valid, _ = marching_tetrahedra(phi, max_tris=MAX_TRIS)
            pts = sample_points_on_triangles(k_, tris, valid, S)
            return jnp.sum(pts)
        vals = jax.lax.map(extract, (p_, keys))
        return jnp.sum(vals)
    l, g = jax.value_and_grad(loss)(ph)
    return l + jnp.sum(g) * 1e-12


if "mt" in STAGES:
    t = chained(mt_body, phis)
    log(f"m_mt    (24x 128^3 MT+sample f+b) {t*1e3:8.1f} ms")


# ---- m_mtb: batched marching tetrahedra (r5 optimization) ----
def mtb_body(ph, i):
    from fissure_segmentation_tpu.ops.marching import \
        marching_tetrahedra_batched

    def loss(p_):
        tris, tvalid, _ = marching_tetrahedra_batched(p_, max_tris=MAX_TRIS)
        pts = jax.vmap(
            lambda k_, t_, v_: sample_points_on_triangles(k_, t_, v_, S))(
            keys, tris, tvalid)
        return jnp.sum(pts)
    l, g = jax.value_and_grad(loss)(ph)
    return l + jnp.sum(g) * 1e-12


if "mtb" in STAGES:
    t = chained(mtb_body, phis)
    log(f"m_mtb   (batched MT+sample f+b)   {t*1e3:8.1f} ms")

# ---- m_cham: chamfer fwd+bwd ----
pts0 = jax.random.uniform(jax.random.PRNGKey(7), (B * CP, S, 3))
targ = jax.random.uniform(jax.random.PRNGKey(8), (B * CP, S, 3))


def cham_body(p, i):
    def loss(p_):
        return chamfer_distance(p_, targ)
    l, g = jax.value_and_grad(loss)(p)
    return l + jnp.sum(g) * 1e-12


if "cham" in STAGES:
    t = chained(cham_body, pts0)
    log(f"m_cham  (24x chamfer 2048^2 f+b)  {t*1e3:8.1f} ms")

# ---- full step (same as bench.py bench_family_steps) ----
if "full" in STAGES:
    from fissure_segmentation_tpu.losses.dpsr import make_dpsr_loss
    import optax
    model = DPSRNet2(seg_net_class="DGCNN", k=K, in_features=3, num_classes=C,
                     dynamic=False, dpsr_res=RES, max_tris=MAX_TRIS,
                     n_surface_samples=S)
    vv = jax.jit(lambda r, a: model.init(r, a, train=False))(
        jax.random.PRNGKey(9), x[:1])
    dpsr_loss = make_dpsr_loss()
    targ_pts = jax.random.uniform(jax.random.PRNGKey(10), (B, 3, S, 3),
                                  jnp.float32, -0.9, 0.9)
    tx = optax.adam(1e-3)
    opt0 = tx.init(vv["params"])


    @jax.jit
    def full_chain(params, bs, opt):
        def bodyf(carry, i):
            params, bs, opt = carry

            def loss(p):
                pred, mut = model.apply(
                    {"params": p, "batch_stats": bs}, x * (1.0 + 1e-12 * i),
                    train=True, rng=jax.random.PRNGKey(8),
                    mutable=["batch_stats"])
                sg, pts, pvalid = pred
                b, c1, s, _ = pts.shape
                l, _ = dpsr_loss((sg, pts.reshape(b * c1, s, 3),
                                  pvalid.reshape(b * c1, s)),
                                 (y, targ_pts.reshape(b * c1, -1, 3)), 1.0)
                return l, mut["batch_stats"]

            (l, nbs), g = jax.value_and_grad(loss, has_aux=True)(params)
            upd, opt = tx.update(g, opt, params)
            return (optax.apply_updates(params, upd), nbs, opt), l

        (params, bs, opt), ls = jax.lax.scan(
            bodyf, (params, bs, opt), jnp.arange(REPS, dtype=jnp.float32))
        return ls[-1]


    args = (vv["params"], vv["batch_stats"], opt0)
    float(full_chain(*args))
    t = timeit(lambda: float(full_chain(*args))) / REPS
    log(f"full    (dpsr train step)         {t*1e3:8.1f} ms   (BENCH_r04: 786.8)")

log("DONE")
