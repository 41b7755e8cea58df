"""EdgeConv-backward scatter: XLA-native alternatives vs the Pallas kernel.

VERDICT r2 item 1(a): benchmark, at the canonical DGCNN config
(B=32, N=2048, k=40 -> E=81920, C=64, bf16 payloads):

  1. scatter_add_mm2      — current champion (two-level one-hot MXU)
  2. scatter_add_mm       — one-level one-hot MXU
  3. XLA scatter-add      — zeros.at[b, idx].add(ct)
  4. sort + segment_sum   — argsort targets, gather payload, sorted segsum
  5. unsorted segment_sum — jax.ops.segment_sum directly

plus 1(b): can ANY Pallas formulation stream faster than the measured
52–55 GB/s BlockSpec-pipeline plateau?  Tests a manual double-buffered
DMA kernel (HBM ref + run_scoped VMEM scratch) against the XLA reduction
(102 GB/s) and XLA copy (215 GB/s) rates from prof_stream_bw.py.
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


def chain(fn, *args):
    """Data-dependent chained reps inside one jit; fetch one scalar."""
    @jax.jit
    def ch(*a):
        def body(c, _):
            out = fn(*a, c)
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
g_bf16 = jax.random.normal(k2, (B, E, C), jnp.float32).astype(jnp.bfloat16)


def run_scatters():
    from fissure_segmentation_tpu.ops.pallas.scatter import (
        scatter_add_mm, scatter_add_mm2)

    def mm2(i, g, c):
        return scatter_add_mm2(i, g + c.astype(g.dtype), N)

    def mm1(i, g, c):
        return scatter_add_mm(i, g + c.astype(g.dtype), N)

    def xla_scatter(i, g, c):
        z = jnp.zeros((B, N, C), jnp.float32)
        return z.at[jnp.arange(B)[:, None], i].add(
            (g + c.astype(g.dtype)).astype(jnp.float32))

    def xla_scatter_bf16(i, g, c):
        z = jnp.zeros((B, N, C), jnp.bfloat16)
        return z.at[jnp.arange(B)[:, None], i].add(g + c.astype(g.dtype))

    def sorted_segsum(i, g, c):
        g = (g + c.astype(g.dtype)).reshape(B * E, C)
        gi = (i + (jnp.arange(B, dtype=i.dtype) * N)[:, None]).reshape(-1)
        order = jnp.argsort(gi)
        gs = jnp.take(g, order, axis=0).astype(jnp.float32)
        return jax.ops.segment_sum(gs, jnp.take(gi, order), B * N,
                                   indices_are_sorted=True)

    def sorted_segsum_sortpayload(i, g, c):
        # sort the payload rows *with* the keys (one fused sort, no gather)
        g = (g + c.astype(g.dtype)).reshape(B * E, C)
        gi = (i + (jnp.arange(B, dtype=i.dtype) * N)[:, None]).reshape(-1)
        sk, sg = jax.lax.sort((gi, g), dimension=0, num_keys=1)
        return jax.ops.segment_sum(sg.astype(jnp.float32), sk, B * N,
                                   indices_are_sorted=True)

    def unsorted_segsum(i, g, c):
        g = (g + c.astype(g.dtype)).reshape(B * E, C).astype(jnp.float32)
        gi = (i + (jnp.arange(B, dtype=i.dtype) * N)[:, None]).reshape(-1)
        return jax.ops.segment_sum(g, gi, B * N)

    for name, fn in [
        ("pallas mm2 (champion)", mm2),
        ("pallas mm1", mm1),
        ("xla scatter-add f32 acc", xla_scatter),
        ("xla scatter-add bf16 acc", xla_scatter_bf16),
        ("argsort+gather+segsum", sorted_segsum),
        ("lax.sort(key,payload)+segsum", sorted_segsum_sortpayload),
        ("unsorted segment_sum", unsorted_segsum),
    ]:
        try:
            t = chain(fn, idx, g_bf16)
            print(f"{name:34s} {t*1e3:8.2f} ms")
        except Exception as ex:  # noqa
            print(f"{name:34s} FAILED: {type(ex).__name__}: {ex}")


def run_streaming():
    nbytes = B * E * C * 2
    print(f"\n--- streaming probes ({nbytes/2**20:.0f} MB bf16 payload) ---")

    def xla_sum(i, g, c):
        return (g + c.astype(g.dtype)).astype(jnp.float32).sum()[None]

    t = chain(xla_sum, idx, g_bf16)
    print(f"{'xla full reduce':34s} {t*1e3:8.2f} ms  {nbytes/t/2**30:6.1f} GB/s")

    # BlockSpec-pipelined Pallas reduce (the measured 52-55 GB/s path)
    def k_reduce(g_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
        out_ref[0, :] += g_ref[...].astype(jnp.float32).sum(axis=0)

    def pallas_blockspec(i, g, c, *, tile=4096):
        g2 = (g + c.astype(g.dtype)).reshape(B * E, C)
        out = pl.pallas_call(
            k_reduce,
            grid=(B * E // tile,),
            in_specs=[pl.BlockSpec((tile, C), lambda gi: (gi, 0))],
            out_specs=pl.BlockSpec((1, C), lambda gi: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
        )(g2[:, None, :].reshape(B * E, C))
        return out.sum()[None]

    t = chain(pallas_blockspec, idx, g_bf16)
    print(f"{'pallas blockspec reduce':34s} {t*1e3:8.2f} ms  {nbytes/t/2**30:6.1f} GB/s")

    # Manual double-buffered DMA reduce: HBM ref, explicit async copies.
    # View the payload as (rows, 128): VMEM scratch slices must be aligned
    # to the 128-lane tiling, so C=64 trailing dims can't be sliced.
    def manual_reduce(i, g, c, *, chunk=8192, nbuf=4):
        rows = B * E * C // 128
        g2 = (g + c.astype(g.dtype)).reshape(rows, 128)
        nchunks = rows // chunk

        def kern(hbm_ref, out_ref):
            def body(scratch, sem):
                def get_dma(slot, ci):
                    return pltpu.make_async_copy(
                        hbm_ref.at[pl.ds(ci * chunk, chunk)],
                        scratch.at[slot], sem.at[slot])
                for s in range(nbuf - 1):
                    get_dma(s, s).start()

                def loop(ci, acc):
                    slot = jax.lax.rem(ci, nbuf)

                    @pl.when(ci + nbuf - 1 < nchunks)
                    def _():
                        get_dma(jax.lax.rem(ci + nbuf - 1, nbuf),
                                ci + nbuf - 1).start()
                    get_dma(slot, ci).wait()
                    return acc + scratch[slot].astype(jnp.float32).sum()

                total = jax.lax.fori_loop(0, nchunks, loop, jnp.float32(0))
                out_ref[0, 0] = total

            pl.run_scoped(
                body,
                scratch=pltpu.VMEM((nbuf, chunk, 128), jnp.bfloat16),
                sem=pltpu.SemaphoreType.DMA((nbuf,)),
            )

        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(g2)
        return out[0]

    for chunk, nbuf in [(4096, 2), (8192, 2), (8192, 4), (16384, 4),
                        (32768, 2)]:
        try:
            t = chain(functools.partial(manual_reduce, chunk=chunk, nbuf=nbuf),
                      idx, g_bf16)
            print(f"{'manual dma c=%d b=%d' % (chunk, nbuf):34s} "
                  f"{t*1e3:8.2f} ms  {nbytes/t/2**30:6.1f} GB/s")
        except Exception as ex:  # noqa
            print(f"manual dma c={chunk} b={nbuf} FAILED: "
                  f"{type(ex).__name__}: {str(ex)[:200]}")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    print(f"--- scatter alternatives (B={B} N={N} k={K} C={C} bf16) ---")
    run_scatters()
    run_streaming()
