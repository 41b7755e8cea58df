"""Measure the r5 threaded 3-stage segment_cases pipeline on the chip.

Compares: single-threaded window fallback (the r4 shape), threaded
3-stage (fetch + host worker threads), window sweep — 8-case batches,
warm-up batch first, 2 reps each.
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
from fissure_segmentation_tpu.serving import segment_cases

SHAPE = B.SHAPE
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


def biased_apply(variables, x, train=False):
    logits = model.apply(variables, x, train=train)
    z, xg = x[..., 2], x[..., 0]
    for c, (mu, w, side) in enumerate(_zb, start=1):
        band = (jnp.abs(z - mu) < w) & (xg * side > 0)
        logits = logits.at[..., c].add(jnp.where(band, 50.0, 0.0))
    return logits


dimg = jax.device_put(img)
dmask = jax.device_put(mask)
KW = dict(center_x=SHAPE[2] / 2)
N = 8


def log(*a):
    print(*a, flush=True)


t0 = time.perf_counter()
segment_cases([dimg] * 2, [dmask] * 2, biased_apply, variables,
              jax.random.PRNGKey(2), **KW)
log("warm batch:", round(time.perf_counter() - t0, 1), "s")

for label, kw in (("fallback w=2", dict(pipeline_threads=False, window=2)),
                  ("threaded w=2", dict(window=2)),
                  ("threaded w=3", dict(window=3)),
                  ("threaded w=4", dict(window=4))):
    per = []
    tms: list = []
    for rep in range(2):
        tm: list = []
        t0 = time.perf_counter()
        res = segment_cases([dimg] * N, [dmask] * N, biased_apply,
                            variables, jax.random.PRNGKey(3 + rep),
                            timings=tm, **KW, **kw)
        per.append((time.perf_counter() - t0) / N)
        tms += tm
        assert all(r.labelmap is not None for r in res)
    keys = sorted({k for t in tms for k in t})
    meds = {k: round(1e3 * float(np.median([t[k] for t in tms if k in t])),
                     1) for k in keys}
    log(f"{label}: {min(per):.4f} s/case (reps {[round(p,4) for p in per]}) "
        f"stage medians ms {meds}")
log("DONE")
