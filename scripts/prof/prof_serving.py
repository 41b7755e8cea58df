"""Stage decomposition of the fused serving path (serving.segment_case).

Measures, on the real chip, for foerstner/cnn modes (reusing the SAME
_device_case executable segment_case compiles — no extra compile cost):
  device  — dispatch + compute, forced by fetching one tiny output (n_tris)
  fetch   — device_get of the full packed outputs already resident on device
  host    — _host_mesh_filter + mesh_to_labelmap (total − device − fetch)
  total   — segment_case wall time

Run: PYTHONPATH=.:$PYTHONPATH python scripts/prof/prof_serving.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fissure_segmentation_tpu.data.synthetic import (
    make_synthetic_image_case, sample_fissure_surface)
from fissure_segmentation_tpu.models import DGCNNSeg
from fissure_segmentation_tpu.models.seg_cnn import (MobileNetASPP,
                                                     predict_full_volume)
from fissure_segmentation_tpu.serving import _device_case, segment_case
from fissure_segmentation_tpu.utils.coords import kpts_to_grid

SHAPE = (256, 256, 256)
MAX_KPTS = 20000

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


KW = dict(apply_fn=biased_apply, max_kpts=MAX_KPTS, sample_points=2048,
          n_runs_min=50, subset_batch=5, grid_res=(64, 64, 64), sig=4.0,
          k_normals=30, max_tris=24000, num_fg_classes=3,
          fissure_mu=-313.5, fissure_sigma=62.6)


def timeit(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def profile(mode, vol):
    def run_dev(seed):
        out = _device_case(vol, mask, variables, jax.random.PRNGKey(seed),
                           kp_mode=mode, **KW)
        # force completion by fetching only the tiny n_tris output
        np.asarray(out[-1])
        return out

    out = run_dev(0)  # compile (shared with segment_case) + warm up
    dev_s = timeit(lambda: run_dev(1))

    # pure transfer of resident outputs
    nbytes = sum(np.asarray(jax.eval_shape(lambda x: x, o)).nbytes
                 if hasattr(o, "nbytes") else 0 for o in out)
    nbytes = sum(o.nbytes for o in jax.device_get(out))
    fetch_s = timeit(lambda: jax.device_get(out))

    res = segment_case(vol, mask, biased_apply, variables,
                       jax.random.PRNGKey(0), kp_mode=mode,
                       center_x=SHAPE[2] / 2)
    tri_counts = [int(v.sum()) for _, v in res.meshes]
    assert all(n > 0 for n in tri_counts), f"empty mesh class: {tri_counts}"
    assert res.labelmap.any()
    total_s = timeit(lambda: segment_case(vol, mask, biased_apply, variables,
                                          jax.random.PRNGKey(1), kp_mode=mode,
                                          center_x=SHAPE[2] / 2))
    print(f"{mode:10s} device {dev_s*1e3:6.1f} | fetch {fetch_s*1e3:6.1f} "
          f"({nbytes/1e6:.2f} MB, {nbytes/fetch_s/1e6:.1f} MB/s) | "
          f"total {total_s*1e3:6.1f} | host+slack "
          f"{(total_s-dev_s-fetch_s)*1e3:6.1f} ms | tris {tri_counts}",
          flush=True)


print("backend:", jax.default_backend(), flush=True)
profile("foerstner", img)

cnn = MobileNetASPP(num_classes=4)
cnn_vars = cnn.init(jax.random.PRNGKey(5),
                    jnp.zeros((1, 128, 128, 128, 1), jnp.float32), train=False)
soft = predict_full_volume(cnn.apply, cnn_vars, img, dtype=jnp.bfloat16)
soft = jax.device_put(soft)
float(jnp.sum(soft[0, 0, 0]))
print("cnn softmax volume:", soft.shape, soft.dtype, flush=True)
profile("cnn", soft)
