"""Fine-grained decomposition of the fused serving path (post dedup-encode).

Splits the 0.30s/case target into device sub-stages (detector / ensemble /
PSR+marching-tets with packed vs coordinate-soup encodings) and host
sub-stages (packed-mesh decode / mask+component filter / labelmap raster),
each timed on the real chip or host individually, plus the true end-to-end
segment_case wall time. Sub-stage dispatches each pay a tunnel round trip,
so they over-count slightly vs the fused total — use them for ratios.

Run: PYTHONPATH=. python scripts/prof/prof_serving2.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fissure_segmentation_tpu.data.synthetic import (
    make_synthetic_image_case, sample_fissure_surface)
from fissure_segmentation_tpu.keypoints.foerstner import foerstner_keypoints
from fissure_segmentation_tpu.models import DGCNNSeg
from fissure_segmentation_tpu.models.ensemble import ensemble_predict
from fissure_segmentation_tpu.postprocess.surface_fitting import (
    _batched_psr_mc, _batched_psr_mc_packed, _decode_packed_mesh,
    _host_mesh_filter, mesh_to_labelmap)
from fissure_segmentation_tpu.serving import segment_case
from fissure_segmentation_tpu.utils.coords import kpts_to_grid

SHAPE = (256, 256, 256)
MAX_KPTS = 20000
GRID = (64, 64, 64)
MAX_TRIS = 24000

case = make_synthetic_image_case(0, shape=SHAPE)
img = jax.device_put(jnp.asarray(case["image"]))
mask = jax.device_put(jnp.asarray(case["lung_mask"]).astype(bool))

model = DGCNNSeg(k=40, in_features=3, num_classes=4, dynamic=False)
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 2048, 3), jnp.float32), train=False)

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
    for c, (m, w, side) in enumerate(_zb, start=1):
        band = (jnp.abs(z - m) < w) & (xg * side > 0)
        logits = logits.at[..., c].add(jnp.where(band, 50.0, 0.0))
    return logits


def timeit(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


# ---- device sub-stages (separate jits; each pays one dispatch RTT) ----
@jax.jit
def stage_detect(vol, mask):
    k, v, _ = foerstner_keypoints(vol, mask, sigma=0.5, d=5, thresh=1e-8,
                                  max_kpts=MAX_KPTS)
    return k, v


@functools.partial(jax.jit, static_argnames=())
def stage_ensemble(coords, rng):
    return ensemble_predict(biased_apply, variables, coords, rng,
                            sample_points=2048, n_runs_min=50, subset_batch=5)


kpts, valid = stage_detect(img, mask)
np.asarray(valid[:1])
t_detect = timeit(lambda: np.asarray(stage_detect(img, mask)[1][:1]))

world = kpts[:, ::-1].astype(jnp.float32)
coords = jnp.where(valid[:, None], kpts_to_grid(world, SHAPE), -1.0)
probs = stage_ensemble(coords, jax.random.PRNGKey(0))
np.asarray(probs[:1, :1])
t_ens = timeit(lambda: np.asarray(
    stage_ensemble(coords, jax.random.PRNGKey(1))[:1, :1]))

pred = jnp.argmax(probs, axis=-1)
class_valid = jnp.stack([valid & (pred == c) for c in (1, 2, 3)])
pts_grid = coords[:, ::-1]


def run_packed(seed):
    out = _batched_psr_mc_packed(pts_grid, class_valid, GRID, 4.0, 30,
                                 MAX_TRIS, 16384)
    np.asarray(out[-1])
    return out


def run_soup(seed):
    out = _batched_psr_mc(pts_grid, class_valid, GRID, 4.0, 30, MAX_TRIS)
    np.asarray(out[-1])
    return out


packed_out = run_packed(0)
t_packed = timeit(lambda: run_packed(1))
soup_out = run_soup(0)
t_soup = timeit(lambda: run_soup(1))

# fetch costs of the resident outputs
po = jax.device_get(packed_out)
so = jax.device_get(soup_out)
pb = sum(o.nbytes for o in po)
sb = sum(o.nbytes for o in so)
t_pfetch = timeit(lambda: jax.device_get(packed_out))
t_sfetch = timeit(lambda: jax.device_get(soup_out))

print(f"device: detect {t_detect*1e3:6.1f} | ensemble {t_ens*1e3:6.1f} | "
      f"psr+mt packed {t_packed*1e3:6.1f} (fetch {t_pfetch*1e3:.1f}, "
      f"{pb/1e6:.2f} MB) | psr+mt soup {t_soup*1e3:6.1f} "
      f"(fetch {t_sfetch*1e3:.1f}, {sb/1e6:.2f} MB)", flush=True)

# ---- host sub-stages ----
inside_bits, idx, vkey, vfrac_q, n_tris, n_verts = po
inside = np.unpackbits(inside_bits, axis=-1, count=int(np.prod(GRID)))
inside = inside.reshape(3, *GRID).astype(bool)
world_np = np.asarray(kpts, np.int32)[:, ::-1].astype(np.float32)
valid_np = np.asarray(valid, bool)
pred_np = np.asarray(pred)

tris_all, t_dec, t_filt = [], 0.0, 0.0
for i in range(3):
    n = int(n_tris[i])
    t0 = time.perf_counter()
    tris_i = _decode_packed_mesh(idx[i], vkey[i], vfrac_q[i], n,
                                 int(n_verts[i]), GRID)
    t_dec += time.perf_counter() - t0
    pts_c = world_np[valid_np & (pred_np == i + 1)]
    t0 = time.perf_counter()
    m = _host_mesh_filter(inside[i], tris_i, np.ones(n, bool), pts_c, SHAPE,
                          GRID, None, 1, [False, True, True][i],
                          SHAPE[2] / 2, True)
    t_filt += time.perf_counter() - t0
    tris_all.append(m)

t_label = timeit(lambda: mesh_to_labelmap(tris_all, SHAPE), reps=2)
print(f"host: decode {t_dec*1e3:6.1f} | filter {t_filt*1e3:6.1f} | "
      f"labelmap {t_label*1e3:6.1f} | "
      f"tris {[int(v.sum()) for _, v in tris_all]} "
      f"n_tris_raw {list(map(int, n_tris))} n_verts {list(map(int, n_verts))}",
      flush=True)

# ---- end-to-end ----
res = segment_case(img, mask, biased_apply, variables, jax.random.PRNGKey(0),
                   center_x=SHAPE[2] / 2)
assert res.labelmap.any()
t_total = timeit(lambda: segment_case(img, mask, biased_apply, variables,
                                      jax.random.PRNGKey(1),
                                      center_x=SHAPE[2] / 2))
print(f"segment_case total {t_total*1e3:6.1f} ms | "
      f"tris {[int(v.sum()) for _, v in res.meshes]}", flush=True)
