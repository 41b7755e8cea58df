import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
from jax import lax
from fissure_segmentation_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(min_compile_secs=1.0)

C, S, R = 192, 128, 8
x = jax.random.normal(jax.random.PRNGKey(0), (1, S, S, S, C), jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 1, C), jnp.bfloat16)
wd = jax.random.normal(jax.random.PRNGKey(2), (C, C), jnp.bfloat16)

def chain(op):
    @jax.jit
    def f(x, w):
        def body(h, i):
            return op(h * (1.0 + 1e-8 * i).astype(h.dtype), w), None
        h, _ = lax.scan(body, x, jnp.arange(R, dtype=jnp.float32))
        return jnp.sum(h.astype(jnp.float32)[0, 0, 0, 0])
    return f

dw = chain(lambda h, w: lax.conv_general_dilated(h, w, (1,1,1), 'SAME',
        feature_group_count=C, dimension_numbers=('NDHWC','DHWIO','NDHWC')))
def shift_op(h, w):
    xp = jnp.pad(h, ((0,0),(1,1),(1,1),(1,1),(0,0)))
    out = jnp.zeros_like(h)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                out = out + xp[:, dz:dz+S, dy:dy+S, dx:dx+S, :] * w[dz, dy, dx, 0]
    return out
sh = chain(shift_op)
de = chain(lambda h, w: jnp.einsum('bdhwc,ce->bdhwe', h, wd))

def timeit(f, *a, tag=""):
    t0=time.perf_counter(); float(f(*a)); first=time.perf_counter()-t0
    ts=[]
    for i in range(3):
        t0=time.perf_counter(); float(f(*a)); ts.append(time.perf_counter()-t0)
    print(tag, 'first', round(first,1), 'per-op ms', round(min(ts)/R*1e3,2))

timeit(dw, x, w, tag=f'depthwise XLA {S}^3x{C} chained')
timeit(sh, x, w, tag='shifted-MAC chained')
timeit(de, x, w, tag='dense 1x1 chained')
