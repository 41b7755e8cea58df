"""Find the floor of the scatter kernel: stream-only vs one-hot vs dot."""
import functools, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, E, C = 32, 81920, 64
N_LO, N_HI = 512, 4
REPS = 8


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


def make(kernel_body, tile_e, out_shape_fn):
    def run(idx, g):
        grid = (B, E // tile_e)
        return pl.pallas_call(
            functools.partial(kernel_body, r=tile_e),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile_e, 1), lambda bi, ei: (bi, ei, 0)),
                pl.BlockSpec((1, tile_e, C), lambda bi, ei: (bi, ei, 0)),
            ],
            out_specs=pl.BlockSpec(out_shape_fn(tile_e),
                                   lambda bi, ei: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(out_shape_fn(tile_e), jnp.float32),
        )(idx[..., None], g)
    return run


# 1. stream-only: reduce payload tile to (1, C), add
def k_stream(idx_ref, g_ref, out_ref, *, r):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
    out_ref[0, 0] += g_ref[0].astype(jnp.float32).sum(axis=0)

# 2. + one-hot build (reduce one-hot to scalarish, no dot)
def k_onehot(idx_ref, g_ref, out_ref, *, r):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
    tgt = idx_ref[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, N_LO), 1)
    onehot = (cols == jax.lax.rem(tgt, N_LO)).astype(jnp.bfloat16)
    gs = g_ref[0].astype(jnp.float32).sum(axis=0)
    gs_pad = jnp.concatenate([gs, jnp.zeros((N_LO - C,), jnp.float32)])
    out_ref[0, 0] += onehot.astype(jnp.float32).sum(axis=0) + gs_pad

# 3. one-hot + dot into (N_LO, C) accumulator (single-level, narrow)
def k_dot(idx_ref, g_ref, out_ref, *, r):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
    tgt = idx_ref[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, N_LO), 1)
    onehot = (cols == jax.lax.rem(tgt, N_LO)).astype(jnp.bfloat16)
    out_ref[0] += jax.lax.dot_general(onehot, g_ref[0],
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)


k1, k2 = jax.random.split(jax.random.PRNGKey(0))
idx = jax.random.randint(k1, (B, E), 0, 2048)
g = jax.random.normal(k2, (B, E, C), jnp.bfloat16)

for tile_e in (1024, 2048, 4096, 8192):
    r1 = make(k_stream, tile_e, lambda t: (1, 1, C))
    def f1(idx, g, c, i):
        return c + r1(idx, g * (1 + 1e-12 * (i + c)).astype(g.dtype))[0, 0, 0]
    t1 = chain(f1, idx, g)
    r2 = make(k_onehot, tile_e, lambda t: (1, 1, N_LO))
    def f2(idx, g, c, i):
        return c + r2(idx, g * (1 + 1e-12 * (i + c)).astype(g.dtype))[0, 0, 0]
    t2 = chain(f2, idx, g)
    print(f"tile={tile_e:5d}: stream {t1*1e3:6.2f} ms   +onehot {t2*1e3:6.2f} ms")

for tile_e in (1024, 2048, 4096):
    r3 = make(k_dot, tile_e, lambda t: (1, N_LO, C))
    def f3(idx, g, c, i):
        return c + r3(idx, g * (1 + 1e-12 * (i + c)).astype(g.dtype))[0, 0, 0]
    t3 = chain(f3, idx, g)
    print(f"tile={tile_e:5d}: onehot+dot(512xC acc) {t3*1e3:6.2f} ms")
