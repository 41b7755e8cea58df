"""Round-5 serving diagnosis (VERDICT r4 items 1-3), one process:

A. serial exact path, phase-split per case: dispatch-return wall, compute
   (+RTT) via a tiny n_tris fetch, bulk transfer, host unpack/decode/filter/
   labelmap — attributes the ~0.11-0.15 s host tail precisely.
B. exact-vs-fast interleaved A/B (same tunnel conditions for both).
C. segment_cases as committed: warm-up batch, then window 1/2/3 sweeps
   with min-of-2 batches (the r4 driver row was one cold shot and read
   2.11 s/case vs 0.296 serial).
D. async-copy prototype: copy_to_host_async after dispatch, phase timings.
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

import bench as B
from fissure_segmentation_tpu.data.synthetic import (
    make_synthetic_image_case, sample_fissure_surface)
from fissure_segmentation_tpu.models import DGCNNSeg
from fissure_segmentation_tpu.utils.coords import kpts_to_grid
from fissure_segmentation_tpu.serving import (segment_case, segment_cases,
                                              _dispatch_case, _finish_case)
from fissure_segmentation_tpu.postprocess.surface_fitting import (
    _decode_packed_mesh, _host_mesh_filter, mesh_to_labelmap)

SHAPE = B.SHAPE
MAX_KPTS = 20000
GRID = (64, 64, 64)
RIGHTS = [False, True, True]

case = make_synthetic_image_case(0, shape=SHAPE)
img = jnp.asarray(case["image"])
mask = jnp.asarray(case["lung_mask"]).astype(bool)
model = DGCNNSeg(k=40, in_features=3, num_classes=4, dynamic=False)
variables = B._jit_init(model, jax.random.PRNGKey(0),
                        jnp.zeros((1, 2048, 3), jnp.float32))
_zb = []
_srng = np.random.default_rng(11)
_scale = np.array(SHAPE[::-1], np.float32) - 1
for c in (1, 2, 3):
    s = sample_fissure_surface(case["surface_params"], c, 2000, _srng)
    g = np.asarray(kpts_to_grid((s * _scale).astype(np.float32), SHAPE))
    _zb.append((float(g[:, 2].mean()), float(2 * g[:, 2].std() + 0.02),
                float(np.sign(g[:, 0].mean()))))


def make_biased_apply(m):
    def biased_apply(variables, x, train=False):
        logits = m.apply(variables, x, train=train)
        z, xg = x[..., 2], x[..., 0]
        for c, (mu, w, side) in enumerate(_zb, start=1):
            band = (jnp.abs(z - mu) < w) & (xg * side > 0)
            logits = logits.at[..., c].add(jnp.where(band, 50.0, 0.0))
        return logits
    return biased_apply


biased_apply = make_biased_apply(model)
model_fast = DGCNNSeg(k=40, in_features=3, num_classes=4, dynamic=False,
                      dtype=jnp.bfloat16, knn_recall=0.9)
biased_apply_fast = make_biased_apply(model_fast)

dimg = jax.device_put(img)
dmask = jax.device_put(mask)
KW = dict(center_x=SHAPE[2] / 2)


def log(*a):
    print(*a, flush=True)


t0 = time.perf_counter()
res = segment_case(dimg, dmask, biased_apply, variables, jax.random.PRNGKey(0),
                   **KW)
log("warm exact", round(time.perf_counter() - t0, 1), "s; tris:",
    [int(v.sum()) for _, v in res.meshes])

# one-time eager fold_in cost (used per-case by segment_cases)
t0 = time.perf_counter()
k = jax.random.fold_in(jax.random.PRNGKey(3), 0)
np.asarray(k)
log("first eager fold_in", round(time.perf_counter() - t0, 3), "s")
t0 = time.perf_counter()
keys = np.asarray(jax.random.split(jax.random.PRNGKey(3), 16))
log("first split(16)+fetch", round(time.perf_counter() - t0, 3), "s")


def host_half(fetched, t_marks):
    (kpts_q, valid_bits, pred, inside_bits, idx, vkey, vfrac_q, n_tris,
     n_verts) = fetched
    t = time.perf_counter()
    valid = np.unpackbits(valid_bits, count=MAX_KPTS).astype(bool)
    kpts = kpts_q.astype(np.int32)
    world = kpts[:, ::-1].astype(np.float32)
    inside = np.unpackbits(inside_bits, axis=-1, count=int(np.prod(GRID)))
    inside = inside.reshape(3, *GRID).astype(bool)
    t_marks["unpack"] = time.perf_counter() - t

    t = time.perf_counter()
    decoded = []
    for i in range(3):
        pts_c = world[valid & (pred == i + 1)]
        n = int(n_tris[i])
        decoded.append((pts_c, _decode_packed_mesh(
            idx[i], vkey[i], vfrac_q[i], n, int(n_verts[i]), GRID), n))
    t_marks["decode"] = time.perf_counter() - t

    t = time.perf_counter()
    meshes = []
    for i, (pts_c, tris_i, n) in enumerate(decoded):
        meshes.append(_host_mesh_filter(
            inside[i], tris_i, np.ones(n, bool), pts_c, SHAPE, GRID,
            None, 1, RIGHTS[i], SHAPE[2] / 2, True))
    t_marks["filter"] = time.perf_counter() - t

    t = time.perf_counter()
    labelmap = mesh_to_labelmap(meshes, SHAPE)
    t_marks["labelmap"] = time.perf_counter() - t
    return labelmap


# ---------- A: serial phase split ----------
log("\n== A: serial exact, phase split ==")
for s in range(8):
    tm = {}
    t_all = time.perf_counter()
    t = time.perf_counter()
    disp = _dispatch_case(dimg, dmask, variables, jnp.asarray(keys[s]),
                          apply_fn=biased_apply)
    tm["dispatch_return"] = time.perf_counter() - t
    out = disp[0]
    t = time.perf_counter()
    counts = jax.device_get(out[7])          # tiny: waits for compute + RTT
    tm["compute_plus_rtt"] = time.perf_counter() - t
    t = time.perf_counter()
    fetched = jax.device_get(out)            # bulk transfer (compute done)
    tm["bulk_fetch"] = time.perf_counter() - t
    nbytes = sum(a.nbytes for a in fetched)
    host_half(fetched, tm)
    tm["total"] = time.perf_counter() - t_all
    log(f"case {s}: " + " ".join(f"{k}={v*1e3:.1f}ms"
                                 for k, v in tm.items()),
        f"bytes={nbytes/1e6:.2f}MB")

# ---------- B: exact vs fast interleaved ----------
log("\n== B: warm fast variant ==")
t0 = time.perf_counter()
res = segment_case(dimg, dmask, biased_apply_fast, variables,
                   jax.random.PRNGKey(0), approx_top_k=True, **KW)
log("warm fast", round(time.perf_counter() - t0, 1), "s; tris:",
    [int(v.sum()) for _, v in res.meshes])
log("== B: interleaved exact/fast (6 pairs) ==")
ex, fa = [], []
for s in range(6):
    t0 = time.perf_counter()
    segment_case(dimg, dmask, biased_apply, variables,
                 jnp.asarray(keys[s]), **KW)
    ex.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    segment_case(dimg, dmask, biased_apply_fast, variables,
                 jnp.asarray(keys[s]), approx_top_k=True, **KW)
    fa.append(time.perf_counter() - t0)
    log(f"pair {s}: exact={ex[-1]:.4f} fast={fa[-1]:.4f}")
log(f"exact min={min(ex):.4f} med={sorted(ex)[3]:.4f} | "
    f"fast min={min(fa):.4f} med={sorted(fa)[3]:.4f}")

# ---------- C: segment_cases as committed ----------
log("\n== C: segment_cases (committed impl) ==")
t0 = time.perf_counter()
segment_cases([dimg] * 2, [dmask] * 2, biased_apply, variables,
              jax.random.PRNGKey(3), window=2, **KW)
log("warm-up batch of 2:", round(time.perf_counter() - t0, 3), "s")
for w in (1, 2, 3):
    per = []
    for rep in range(2):
        t0 = time.perf_counter()
        segment_cases([dimg] * 8, [dmask] * 8, biased_apply, variables,
                      jax.random.PRNGKey(3 + rep), window=w, **KW)
        per.append((time.perf_counter() - t0) / 8)
        log(f"  window={w} rep={rep}: {per[-1]:.4f} s/case")
    log(f"window={w}: min {min(per):.4f} s/case")

# ---------- D: async-copy prototype ----------
log("\n== D: async-copy prototype (window=2) ==")
has_async = hasattr(jax.device_put(jnp.zeros(4)), "copy_to_host_async")
log("copy_to_host_async available:", has_async)


def pipe_async(n, w, keys):
    pending = []
    t_marks = []
    for i in range(n):
        tm = {}
        t = time.perf_counter()
        disp = _dispatch_case(dimg, dmask, variables, jnp.asarray(keys[i]),
                              apply_fn=biased_apply)
        tm["dispatch_return"] = time.perf_counter() - t
        if has_async:
            t = time.perf_counter()
            for a in disp[0]:
                try:
                    a.copy_to_host_async()
                except Exception as e:  # noqa: BLE001
                    tm["async_err"] = repr(e)[:60]
                    break
            tm["async_call"] = time.perf_counter() - t
        pending.append((i, disp, tm))
        if len(pending) >= w:
            _finish_one(*pending.pop(0), t_marks)
    while pending:
        _finish_one(*pending.pop(0), t_marks)
    return t_marks


def _finish_one(i, disp, tm, t_marks):
    t = time.perf_counter()
    fetched = jax.device_get(disp[0])
    tm["fetch"] = time.perf_counter() - t
    host_half(fetched, tm)
    t_marks.append(tm)


for rep in range(2):
    t0 = time.perf_counter()
    marks = pipe_async(8, 2, np.asarray(
        jax.random.split(jax.random.PRNGKey(9 + rep), 8)))
    tot = time.perf_counter() - t0
    log(f"  async w=2 rep={rep}: {tot/8:.4f} s/case")
    for i, tm in enumerate(marks):
        log(f"    case {i}: " + " ".join(
            f"{k}={v*1e3:.1f}ms" if isinstance(v, float) else f"{k}={v}"
            for k, v in tm.items()))

log("\nDONE")
