"""CNN-pipeline cumulative stage decomposition (PERF.md CNN stage table)."""
import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))))
import time, functools
import jax, jax.numpy as jnp, numpy as np
from fissure_segmentation_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(min_compile_secs=1.0)
import bench as B
from fissure_segmentation_tpu.data.synthetic import make_synthetic_image_case, sample_fissure_surface
from fissure_segmentation_tpu.models import DGCNNSeg
from fissure_segmentation_tpu.models.seg_cnn import MobileNetASPP, predict_full_volume
from fissure_segmentation_tpu.models.ensemble import ensemble_predict
from fissure_segmentation_tpu.keypoints.extraction import get_cnn_keypoints
from fissure_segmentation_tpu.utils.coords import kpts_to_grid
from fissure_segmentation_tpu import serving

SHAPE = B.SHAPE
case = make_synthetic_image_case(0, shape=SHAPE)
img = jnp.asarray(case["image"]); mask = jnp.asarray(case["lung_mask"]).astype(bool)
model16 = DGCNNSeg(k=40, in_features=3, num_classes=4, dynamic=False, dtype=jnp.bfloat16)
variables = B._jit_init(model16, jax.random.PRNGKey(0), jnp.zeros((1,2048,3), jnp.float32))
cnn = MobileNetASPP(num_classes=4)
cnn_vars = B._jit_init(cnn, jax.random.PRNGKey(5), jnp.zeros((1,128,128,128,1), jnp.float32))

_zb = []
_srng = np.random.default_rng(11)
_scale = np.array(SHAPE[::-1], np.float32) - 1
for c in (1,2,3):
    s = sample_fissure_surface(case["surface_params"], c, 2000, _srng)
    g = np.asarray(kpts_to_grid((s*_scale).astype(np.float32), SHAPE))
    _zb.append((float(g[:,2].mean()), float(2*g[:,2].std()+0.02), float(np.sign(g[:,0].mean()))))

def biased_apply(variables, x, train=False):
    logits = model16.apply(variables, x, train=train)
    z, xg = x[...,2], x[...,0]
    for c,(mu,w,side) in enumerate(_zb, start=1):
        band = (jnp.abs(z-mu)<w)&(xg*side>0)
        logits = logits.at[...,c].add(jnp.where(band,50.0,0.0))
    return logits

dimg = jax.device_put(img)

@jax.jit
def stage_fwd(vol, rng):
    soft = predict_full_volume(cnn.apply, cnn_vars, vol, dtype=jnp.bfloat16)
    return jnp.sum(soft[0,0,0])

@jax.jit
def stage_kpts(vol, rng):
    soft = predict_full_volume(cnn.apply, cnn_vars, vol, dtype=jnp.bfloat16)
    kp, valid, _ = get_cnn_keypoints(soft, mask, max_kpts=20000, rng=rng,
                                     want_features=False, approx_top_k=True)
    return jnp.sum(jnp.where(valid, kp[:,0], 0))

@jax.jit
def stage_ens(vol, rng):
    soft = predict_full_volume(cnn.apply, cnn_vars, vol, dtype=jnp.bfloat16)
    kp, valid, _ = get_cnn_keypoints(soft, mask, max_kpts=20000, rng=rng,
                                     want_features=False, approx_top_k=True)
    world = kp[:, ::-1].astype(jnp.float32)
    coords = kpts_to_grid(world, SHAPE)
    coords = jnp.where(valid[:,None], coords, -1.0)
    probs = ensemble_predict(biased_apply, variables, coords, rng,
                             sample_points=2048, n_runs_min=50, subset_batch=5)
    return jnp.sum(jnp.argmax(probs,-1))

def timeit(f, n=5):
    ts=[]
    for i in range(n):
        t0=time.perf_counter(); float(f(dimg, jax.random.PRNGKey(i))); ts.append(time.perf_counter()-t0)
    return ts

for name, f in (("fwd", stage_fwd), ("fwd+kpts", stage_kpts), ("fwd+kpts+ens", stage_ens)):
    t0=time.perf_counter(); float(f(dimg, jax.random.PRNGKey(99)))
    print(name, 'first', round(time.perf_counter()-t0,1), 'reps', [round(x,4) for x in timeit(f)])

# full device_case incl. PSR/MT/pack, scalar-forced (no packed fetch):
@jax.jit
def stage_full_scalar(vol, rng):
    out = serving._device_case(vol, mask, variables, rng, apply_fn=biased_apply,
        kp_mode="cnn", max_kpts=20000, sample_points=2048, n_runs_min=50,
        subset_batch=5, grid_res=(64,64,64), sig=4.0, k_normals=30,
        max_tris=24000, num_fg_classes=3, fissure_mu=-313.5, fissure_sigma=62.6,
        approx_top_k=True, max_verts=16384, cnn_apply_fn=cnn.apply,
        cnn_variables=cnn_vars, cnn_dtype=jnp.bfloat16, class_cap=8192)
    return sum(jnp.sum(o[-5:].astype(jnp.float32)) if o.ndim else o.astype(jnp.float32) for o in out[:2]) + out[7].astype(jnp.float32).sum()
t0=time.perf_counter(); float(stage_full_scalar(dimg, jax.random.PRNGKey(98)))
print('full-device-scalar first', round(time.perf_counter()-t0,1), 'reps', [round(x,4) for x in timeit(stage_full_scalar)])

# full segment_case (packed fetch + host decode + labelmap):
def full(seed):
    return serving.segment_case(dimg, mask, biased_apply, variables,
        jax.random.PRNGKey(seed), kp_mode="cnn", center_x=SHAPE[2]/2,
        approx_top_k=True, cnn_apply_fn=cnn.apply, cnn_variables=cnn_vars,
        cnn_dtype=jnp.bfloat16)
t0=time.perf_counter(); r=full(0); print('segment_case first', round(time.perf_counter()-t0,1))
ts=[]
for s in range(1,6):
    t0=time.perf_counter(); r=full(s); ts.append(time.perf_counter()-t0)
print('segment_case reps', [round(x,4) for x in ts])
# and without labelmap:
def full_nolm(seed):
    return serving.segment_case(dimg, mask, biased_apply, variables,
        jax.random.PRNGKey(seed), kp_mode="cnn", center_x=SHAPE[2]/2,
        approx_top_k=True, cnn_apply_fn=cnn.apply, cnn_variables=cnn_vars,
        cnn_dtype=jnp.bfloat16, make_labelmap=False)
full_nolm(0)
ts=[]
for s in range(1,6):
    t0=time.perf_counter(); r=full_nolm(s); ts.append(time.perf_counter()-t0)
print('segment_case no-labelmap reps', [round(x,4) for x in ts])
