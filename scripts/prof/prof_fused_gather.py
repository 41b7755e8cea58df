"""VERDICT r2 item 1(c): measure a VMEM-resident fused gather+max block.

The candidate kernel keeps the (N, F) point-feature table in VMEM, gathers
each edge row as a one-hot MXU dot (exact in bf16: products are value*1),
and reduces max over the k consecutive edge rows of each point in-register,
so the (B, N, k, F) neighbor tensor never exists in HBM.

Compare against the XLA path the model actually uses (flat row-gather
feeding a max), at the canonical config B=32, N=2048, k=40, F=64.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, N, K, F = 32, 2048, 40, 64
E = N * K
REPS = 8

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
idx = jax.random.randint(k1, (B, N, K), 0, N)
a = jax.random.normal(k2, (B, N, F), jnp.float32).astype(jnp.bfloat16)


def chain(fn, *args):
    @jax.jit
    def ch(*a_):
        def body(c, i):
            out = fn(a_[0], a_[1] * (1 + 1e-12 * (i + c)).astype(a_[1].dtype))
            return c + out.ravel()[0].astype(jnp.float32) * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(REPS, dtype=jnp.float32))
        return c
    float(ch(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(ch(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS


def xla_gather_max(idx, a):
    offs = jnp.arange(B, dtype=idx.dtype)[:, None, None] * N
    g = a.reshape(B * N, F)[(idx + offs).reshape(-1)].reshape(B, N, K, F)
    return g.max(-2)


def _kernel(idx_ref, a_ref, out_ref, *, tile_p: int, n: int, k: int, f: int):
    # tile of points: gather k*tile_p rows via one-hot dot, max per point
    tgt = idx_ref[0]                                    # (R, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_p * k, n), 1)
    onehot = (cols == tgt).astype(jnp.bfloat16)
    g = jax.lax.dot_general(onehot, a_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out_ref[0] = g.reshape(tile_p, k, f).max(axis=1)


def pallas_gather_max(idx, a, tile_p=32):
    kernel = functools.partial(_kernel, tile_p=tile_p, n=N, k=K, f=F)
    return pl.pallas_call(
        kernel,
        grid=(B, N // tile_p),
        in_specs=[
            pl.BlockSpec((1, tile_p * K, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, F), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_p, F), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, F), jnp.float32),
    )(idx.reshape(B, E, 1), a)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    ref = xla_gather_max(idx, a)
    for tile_p in (16, 32, 64):
        try:
            out = pallas_gather_max(idx, a, tile_p)
            ok = bool(jnp.allclose(out, ref.astype(jnp.float32), atol=1e-2))
            t = chain(functools.partial(
                pallas_gather_max, tile_p=tile_p), idx, a)
            print(f"pallas one-hot gather+max tile_p={tile_p:3d}: "
                  f"{t*1e3:7.2f} ms  correct={ok}")
        except Exception as ex:  # noqa
            print(f"tile_p={tile_p} FAILED: {type(ex).__name__}: "
                  f"{str(ex)[:120]}")
    t = chain(xla_gather_max, idx, a)
    print(f"xla flat gather + max:            {t*1e3:7.2f} ms")
