"""All four serving-row latencies, min/median of 8 (PERF.md / README headline table)."""
import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))))
import time
import jax, jax.numpy as jnp, numpy as np
from fissure_segmentation_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(min_compile_secs=1.0)
import bench as B
from fissure_segmentation_tpu.data.synthetic import make_synthetic_image_case, sample_fissure_surface
from fissure_segmentation_tpu.models import DGCNNSeg
from fissure_segmentation_tpu.models.seg_cnn import MobileNetASPP
from fissure_segmentation_tpu.utils.coords import kpts_to_grid
from fissure_segmentation_tpu import serving

SHAPE = B.SHAPE
case = make_synthetic_image_case(0, shape=SHAPE)
img = jnp.asarray(case["image"]); mask = jnp.asarray(case["lung_mask"]).astype(bool)
m_f32 = DGCNNSeg(k=40, in_features=3, num_classes=4, dynamic=False)
m_b16 = DGCNNSeg(k=40, in_features=3, num_classes=4, dynamic=False, dtype=jnp.bfloat16)
m_fast = DGCNNSeg(k=40, in_features=3, num_classes=4, dynamic=False, dtype=jnp.bfloat16, knn_recall=0.9)
variables = B._jit_init(m_f32, jax.random.PRNGKey(0), jnp.zeros((1,2048,3), jnp.float32))
_zb=[]; _srng=np.random.default_rng(11); _scale=np.array(SHAPE[::-1],np.float32)-1
for c in (1,2,3):
    s=sample_fissure_surface(case["surface_params"],c,2000,_srng)
    g=np.asarray(kpts_to_grid((s*_scale).astype(np.float32),SHAPE))
    _zb.append((float(g[:,2].mean()),float(2*g[:,2].std()+0.02),float(np.sign(g[:,0].mean()))))
def make_biased(m):
    def biased_apply(variables,x,train=False):
        logits=m.apply(variables,x,train=train)
        z,xg=x[...,2],x[...,0]
        for c,(mu,w,side) in enumerate(_zb,start=1):
            band=(jnp.abs(z-mu)<w)&(xg*side>0)
            logits=logits.at[...,c].add(jnp.where(band,50.0,0.0))
        return logits
    return biased_apply
ba_f32, ba_b16, ba_fast = make_biased(m_f32), make_biased(m_b16), make_biased(m_fast)
dimg = jax.device_put(img)
cnn = MobileNetASPP(num_classes=4)
cnn_vars = B._jit_init(cnn, jax.random.PRNGKey(5), jnp.zeros((1,128,128,128,1), jnp.float32))

def run(tag, apply, approx=False, reps=8, kp_mode='foerstner', **kw):
    def once(seed):
        return serving.segment_case(dimg, mask, apply, variables,
            jax.random.PRNGKey(seed), kp_mode=kp_mode,
            center_x=SHAPE[2]/2, approx_top_k=approx, **kw)
    t0=time.perf_counter(); r=once(0); print(tag, 'first', round(time.perf_counter()-t0,1), flush=True)
    ts=[]
    for s in range(1, reps+1):
        t0=time.perf_counter(); r=once(s); ts.append(time.perf_counter()-t0)
    print(tag, 'min', round(min(ts),4), 'med', round(sorted(ts)[len(ts)//2],4), [round(x,3) for x in ts], flush=True)
    return r

r = run('exact f32 foerstner', ba_f32)
print('  tris', [int(v.sum()) for _,v in r.meshes], flush=True)
run('fast bf16+approx foerstner', ba_fast, approx=True)
r = run('cnn fused bf16+approx', ba_b16, approx=True, kp_mode='cnn',
        cnn_apply_fn=cnn.apply, cnn_variables=cnn_vars, cnn_dtype=jnp.bfloat16)
print('  cnn tris', [int(v.sum()) for _,v in r.meshes], 'labelmap any', bool(r.labelmap.any()), flush=True)
run('hessian enhancement', ba_f32, kp_mode='enhancement')
