import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))))
import time
import jax, jax.numpy as jnp
from jax import lax
from fissure_segmentation_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(min_compile_secs=1.0)
from fissure_segmentation_tpu.ops.pallas.depthwise import depthwise_conv3_ring

C, S, R = 192, 128, 8
x = jax.random.normal(jax.random.PRNGKey(0), (1, S, S, S, C), jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, C), jnp.bfloat16)

ref = lax.conv_general_dilated(x, w.reshape(3,3,3,1,C), (1,1,1), 'SAME',
        feature_group_count=C, dimension_numbers=('NDHWC','DHWIO','NDHWC'))
try:
    out = depthwise_conv3_ring(x, w, th=32)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)-ref.astype(jnp.float32))))
    print('th=32 max err', err)
except Exception as e:
    print('FAILED:', str(e)[:500])
    raise SystemExit

def chain(op):
    @jax.jit
    def f(x, w):
        def body(h, i):
            return op(h * (1.0 + 1e-8 * i).astype(h.dtype), w), None
        h, _ = lax.scan(body, x, jnp.arange(R, dtype=jnp.float32))
        return jnp.sum(h.astype(jnp.float32)[0, 0, 0, 0])
    return f

for th in (16, 32, 64):
    try:
        f = chain(lambda a, b, _t=th: depthwise_conv3_ring(a, b, th=_t))
        t0=time.perf_counter(); float(f(x,w)); first=time.perf_counter()-t0
        ts=[]
        for i in range(3):
            t0=time.perf_counter(); float(f(x,w)); ts.append(time.perf_counter()-t0)
        print('ring th', th, 'first', round(first,1), 'per-op ms', round(min(ts)/R*1e3,2))
    except Exception as e:
        print('ring th', th, 'FAILED:', str(e)[:300])
