"""Clean scatter-kernel timing: scalar-injected data dependence.

The round-2 chained-scan harness fed data dependence through `g + c`,
adding a full 640 MB elementwise pass (and, reshaped, a relayout) to every
measured iteration. This probe injects the scan carry through a tiny
(1, 128) side input instead, so the 320 MB payload stays loop-invariant
in HBM and the kernel's own streaming is what gets timed.

Measures:
  1. stream floor, 64-lane blocks  (the round-2 kernel's g layout)
  2. stream floor, 128-lane blocks (payload viewed as (B, E/2, 128))
  3. scatter_add_mm2 with scalar-injected dependence (true kernel time)
  4. mm2 variant reading g as 128-lane blocks, un-interleaved in-kernel
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, N, K, C = 32, 2048, 40, 64
E = N * K
REPS = 8
NBYTES = B * E * C * 2


def chain(fn, *args):
    @jax.jit
    def ch(*a):
        def body(c, _):
            s = jnp.full((1, 128), c, jnp.float32)
            out = fn(*a, s)
            return out.astype(jnp.float32).ravel()[0] * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return c
    float(ch(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(ch(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS


key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
idx = jax.random.randint(k1, (B, E), 0, N)
g = jax.random.normal(k2, (B, E, C), jnp.float32).astype(jnp.bfloat16)


def k_stream(g_ref, s_ref, out_ref, *, lanes):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[...] = s_ref[...] * 1e-20
    out_ref[0, :] += g_ref[0].astype(jnp.float32).sum(axis=0)[:128] \
        if lanes >= 128 else jnp.pad(
            g_ref[0].astype(jnp.float32).sum(axis=0), (0, 128 - lanes))


def stream_floor(lanes, tile):
    cols = lanes
    rows = B * E * C // cols

    def run(gx, s):
        g2 = gx.reshape(B, rows // B, cols)
        return pl.pallas_call(
            functools.partial(k_stream, lanes=lanes),
            grid=(B, rows // B // tile),
            in_specs=[
                pl.BlockSpec((1, tile, cols), lambda bi, ei: (bi, ei, 0)),
                pl.BlockSpec((1, 128), lambda bi, ei: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 128), lambda bi, ei: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(g2, s)
    return run


def main():
    from fissure_segmentation_tpu.ops.pallas.scatter import scatter_add_mm2

    for lanes, tile in [(64, 2048), (128, 2048), (128, 4096), (256, 2048),
                        (512, 1024)]:
        t = chain(stream_floor(lanes, tile), g)
        print(f"stream {lanes:4d}-lane tile={tile:5d}   {t*1e3:7.2f} ms  "
              f"{NBYTES/t/2**30:6.1f} GB/s")

    def mm2_clean(i, gx, s):
        return scatter_add_mm2(i, gx, N) + s[0, 0] * 1e-20

    t = chain(mm2_clean, idx, g)
    print(f"{'mm2 (scalar-injected dep)':28s} {t*1e3:7.2f} ms")

    # A 128-lane "wide" mm2 variant (two edges per payload row, even/odd
    # half-tile dots) measured 4.64-4.76 ms across tiles 1024-4096 -- equal
    # to mm2 within noise, so it was removed: the kernel is not limited by
    # the 64-lane payload stream once the harness add-pass is excluded.


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    main()
