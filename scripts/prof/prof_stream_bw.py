"""Why is streaming (B,E,C) through a Pallas grid 25x below HBM bandwidth?"""
import functools, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, E, C = 32, 81920, 64
REPS = 8
GB = B * E * C * 2 / 1e9


def chain(fn, *args):
    @jax.jit
    def ch(*a):
        def body(c, i):
            return fn(*a, c, i), ()
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(REPS, dtype=jnp.float32))
        return c
    float(ch(*args)); ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(ch(*args)); ts.append(time.perf_counter() - t0)
    return min(ts) / REPS


def k_sum(g_ref, out_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
    out_ref[0, 0] += g_ref[0].astype(jnp.float32).sum(axis=0)


def stream(shape2, tile, grid_b=True):
    """Stream (B, R, L) with blocks (1, tile, L)."""
    r, l = shape2
    def run(g):
        return pl.pallas_call(
            k_sum,
            grid=(B, r // tile),
            in_specs=[pl.BlockSpec((1, tile, l), lambda bi, ei: (bi, ei, 0))],
            out_specs=pl.BlockSpec((1, 1, l), lambda bi, ei: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 1, l), jnp.float32),
        )(g)
    return run


k2 = jax.random.PRNGKey(0)
g = jax.random.normal(k2, (B, E, C), jnp.bfloat16)

variants = [
    ("(E,64)   tile 1024", (E, C), 1024, lambda g: g),
    ("(E,64)   tile 4096", (E, C), 4096, lambda g: g),
    ("(E/2,128) tile 2048", (E // 2, 2 * C), 2048, lambda g: g.reshape(B, E // 2, 2 * C)),
    ("(E/8,512) tile 1024", (E // 8, 8 * C), 1024, lambda g: g.reshape(B, E // 8, 8 * C)),
    ("(E/16,1024) tile 512", (E // 16, 16 * C), 512, lambda g: g.reshape(B, E // 16, 16 * C)),
]
for name, shp, tile, prep in variants:
    r = stream(shp, tile)
    def f(g, c, i):
        gg = prep(g * (1 + 1e-12 * (i + c)).astype(g.dtype))
        return c + r(gg)[0, 0, 0]
    t = chain(f, g)
    print(f"{name:22s}: {t*1e3:6.2f} ms  = {GB/t:6.0f} GB/s")

# f32 payload comparison
gf = g.astype(jnp.float32)
GBf = GB * 2
r = stream((E, C), 1024)
def ff(g, c, i):
    return c + r(g * (1 + 1e-12 * (i + c)))[0, 0, 0]
t = chain(ff, gf)
print(f"f32 (E,64) tile 1024  : {t*1e3:6.2f} ms  = {GBf/t:6.0f} GB/s")
