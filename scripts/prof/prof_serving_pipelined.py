"""Pipelined vs sequential serving throughput on the chip (PERF.md batch-serving row)."""
import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))))
import time
import jax, jax.numpy as jnp, numpy as np
from fissure_segmentation_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(min_compile_secs=1.0)
import bench as B
from fissure_segmentation_tpu.data.synthetic import make_synthetic_image_case, sample_fissure_surface
from fissure_segmentation_tpu.models import DGCNNSeg
from fissure_segmentation_tpu.utils.coords import kpts_to_grid
from fissure_segmentation_tpu.serving import segment_case, segment_cases

SHAPE = B.SHAPE
case = make_synthetic_image_case(0, shape=SHAPE)
img = jnp.asarray(case["image"]); mask = jnp.asarray(case["lung_mask"]).astype(bool)
model = DGCNNSeg(k=40, in_features=3, num_classes=4, dynamic=False)
variables = B._jit_init(model, jax.random.PRNGKey(0), jnp.zeros((1,2048,3), jnp.float32))
_zb=[]; _srng=np.random.default_rng(11); _scale=np.array(SHAPE[::-1],np.float32)-1
for c in (1,2,3):
    s=sample_fissure_surface(case["surface_params"],c,2000,_srng)
    g=np.asarray(kpts_to_grid((s*_scale).astype(np.float32),SHAPE))
    _zb.append((float(g[:,2].mean()),float(2*g[:,2].std()+0.02),float(np.sign(g[:,0].mean()))))
def biased_apply(variables,x,train=False):
    logits=model.apply(variables,x,train=train)
    z,xg=x[...,2],x[...,0]
    for c,(mu,w,side) in enumerate(_zb,start=1):
        band=(jnp.abs(z-mu)<w)&(xg*side>0)
        logits=logits.at[...,c].add(jnp.where(band,50.0,0.0))
    return logits
N = 8
mul = jax.jit(lambda a, c: a * c)
dvols = [mul(img, 1.0 + 1e-6 * i) for i in range(N)]
jax.block_until_ready(dvols)
dmask = jax.device_put(mask)
t0=time.perf_counter()
segment_case(dvols[0], dmask, biased_apply, variables, jax.random.PRNGKey(0), center_x=SHAPE[2]/2)
print('warm', round(time.perf_counter()-t0,1), flush=True)

t0=time.perf_counter()
for i in range(N):
    segment_case(img, dmask, biased_apply, variables,
                 jax.random.fold_in(jax.random.PRNGKey(1), i), center_x=SHAPE[2]/2)
print('sequential SAME vol', round((time.perf_counter()-t0)/N,4), 's/case', flush=True)

t0=time.perf_counter()
for i in range(N):
    segment_case(dvols[i], dmask, biased_apply, variables,
                 jax.random.fold_in(jax.random.PRNGKey(1), i), center_x=SHAPE[2]/2)
print('sequential distinct vols', round((time.perf_counter()-t0)/N,4), 's/case', flush=True)

t0=time.perf_counter()
res = segment_cases(dvols, [dmask]*N, biased_apply, variables,
                    jax.random.PRNGKey(1), window=2, center_x=SHAPE[2]/2)
pip = time.perf_counter()-t0
print('pipelined distinct w=2', round(pip/N,4), 's/case', flush=True)

t0=time.perf_counter()
res = segment_cases([img]*N, [dmask]*N, biased_apply, variables,
                    jax.random.PRNGKey(1), window=2, center_x=SHAPE[2]/2)
pip = time.perf_counter()-t0
print('pipelined SAME w=2', round(pip/N,4), 's/case', flush=True)
