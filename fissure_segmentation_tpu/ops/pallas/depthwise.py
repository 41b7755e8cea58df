"""Pallas 3x3x3 depthwise convolutions (stride 1, SAME) — a MEASURED
NEGATIVE RESULT, kept as the experimental record (PERF.md "Negative
results", 2026-08-21).

XLA's grouped-convolution lowering runs the MobileNet3D depthwise layers
(reference mobilenet.py:26-39) at ~66 GB/s effective on the bench v5e
(24.4 ms for one 128^3 x 192 bf16 layer, chained measurement,
scripts/prof/prof_depthwise.py). A depthwise conv is 27 shifted
multiply-accumulates, so two single-pass formulations were built and
benchmarked (scripts/prof/prof_depthwise_ring.py):

  * depthwise_conv3 — three BlockSpec views of the same input at z-1/z/z+1
    (clamped index maps, borders zero-masked in-kernel). Correct, but the
    serving shapes exceed VMEM (3 x 4 MB in + out + f32 acc > 16 MB); only
    reduced channel tiles compile, and Mosaic rejects non-128-multiple
    lane tiles (C = 96/144/192 — exactly the MobileNet widths).
  * depthwise_conv3_ring — manual-DMA 4-slot ring streaming (th+2, W, C)
    H-slabs from HBM: ~1.06x read + 1x write, the theoretical 2-pass
    optimum (~12 ms at this chip's ~170 GB/s streaming floor). Measured
    34.2 ms at C=256: the per-step bf16->f32 conversions, pad copies and
    27-tap VPU chain dominate the saved HBM traffic.

Neither beats XLA at the shapes that matter, so models/seg_cnn keeps
`lax.conv_general_dilated(feature_group_count=C)`. Both kernels stay
correctness-pinned (tests/test_pallas_kernels.py) for future revisits with
a different in-kernel vector schedule.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._config import interpret_mode


def _dw_kernel(xm_ref, x0_ref, xp_ref, w_ref, out_ref, *, h: int, w: int,
               tc: int):
    z = pl.program_id(1)
    nz = pl.num_programs(1)
    acc = jnp.zeros((h, w, tc), jnp.float32)
    refs = (xm_ref, x0_ref, xp_ref)
    # zero the clamped duplicate plane at the z borders
    masks = ((z > 0).astype(jnp.float32), jnp.float32(1.0),
             (z < nz - 1).astype(jnp.float32))
    for dz in range(3):
        plane = refs[dz][0, 0].astype(jnp.float32) * masks[dz]
        padded = jnp.pad(plane, ((1, 1), (1, 1), (0, 0)))
        for dy in range(3):
            for dx in range(3):
                tap = padded[dy:dy + h, dx:dx + w, :]
                acc = acc + tap * w_ref[dz, dy, dx].astype(jnp.float32)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _dw_ring_kernel(x_hbm, w_ref, out_hbm, *, d: int, th: int, w: int, c: int):
    """One (batch, h-slab) program: stream all D z-planes through a 4-slot
    VMEM ring (each slot one (th+2, w, c) H-slab with its ±1-row halo), DMA'd
    straight from HBM — every input element is read ~(th+2)/th times and
    written once, vs the ~4 HBM passes of XLA's grouped-conv lowering."""
    b = pl.program_id(0)
    hb = pl.program_id(1)
    nhb = pl.num_programs(1)
    h0 = hb * th

    def body(ring, stage, in_sem, out_sem):
        # A slab holds rows [h0-1, h0+th+1) of one z-plane: row halos for
        # the dy taps. Border slabs fetch only their in-range rows (static
        # sizes via pl.when on hb) and zero the halo row — SAME padding.
        def fetch(z, slot, start):
            # start and wait must use IDENTICAL copy descriptors (the DMA
            # semaphore counts bytes), so both run through the same three
            # statically-sized hb branches
            def go(cp):
                cp.start() if start else cp.wait()

            @pl.when(hb == 0)
            def _():
                go(pltpu.make_async_copy(x_hbm.at[b, z, pl.ds(0, th + 1)],
                                         ring.at[slot, pl.ds(1, th + 1)],
                                         in_sem.at[slot]))

            @pl.when((hb > 0) & (hb < nhb - 1))
            def _():
                go(pltpu.make_async_copy(
                    x_hbm.at[b, z, pl.ds(h0 - 1, th + 2)],
                    ring.at[slot], in_sem.at[slot]))

            @pl.when(hb == nhb - 1)
            def _():
                go(pltpu.make_async_copy(
                    x_hbm.at[b, z, pl.ds(h0 - 1, th + 1)],
                    ring.at[slot, pl.ds(0, th + 1)], in_sem.at[slot]))

        def wait_fetch(z, slot):
            fetch(z, slot, start=False)

        def zero_borders(slot):
            @pl.when(hb == 0)
            def _():
                ring[slot, 0] = jnp.zeros((w, c), ring.dtype)

            @pl.when(hb == nhb - 1)
            def _():
                ring[slot, th + 1] = jnp.zeros((w, c), ring.dtype)

        # warm-up: planes 0 and 1 (D >= 2 is asserted by the wrapper)
        fetch(0, 0, start=True)
        fetch(1, 1, start=True)

        def step(z, _):
            # prefetch plane z+2 into the slot 3 ahead (slots z-1, z, z+1
            # are live while computing out[z]; ring of 4 gives the prefetch
            # a free slot)
            @pl.when(z + 2 < d)
            def _():
                fetch(z + 2, (z + 2) % 4, start=True)

            @pl.when(z + 1 < d)
            def _():
                wait_fetch(z + 1, (z + 1) % 4)
                zero_borders((z + 1) % 4)

            @pl.when(z == 0)
            def _():
                wait_fetch(0, 0)
                zero_borders(0)

            acc = jnp.zeros((th, w, c), jnp.float32)
            for dz in range(3):
                slot = (z + dz - 1) % 4
                zvalid = (z + dz - 1 >= 0) & (z + dz - 1 <= d - 1)
                # where(), not *mask: a dead slot may hold uninitialized
                # VMEM (NaN * 0 = NaN)
                slab = jnp.where(zvalid, ring[slot].astype(jnp.float32), 0.0)
                padded = jnp.pad(slab, ((0, 0), (1, 1), (0, 0)))
                for dy in range(3):
                    for dx in range(3):
                        tap = padded[dy:dy + th, dx:dx + w, :]
                        acc = acc + tap * w_ref[dz, dy, dx].astype(jnp.float32)
            # drain the previous slab's store before reusing the staging
            @pl.when(z > 0)
            def _():
                pltpu.make_async_copy(stage, out_hbm.at[b, z - 1,
                                                        pl.ds(h0, th)],
                                      out_sem).wait()

            stage[...] = acc.astype(stage.dtype)
            pltpu.make_async_copy(stage, out_hbm.at[b, z, pl.ds(h0, th)],
                                  out_sem).start()
            return 0

        jax.lax.fori_loop(0, d, step, 0)
        pltpu.make_async_copy(stage, out_hbm.at[b, d - 1, pl.ds(h0, th)],
                              out_sem).wait()

    dt = x_hbm.dtype
    pl.run_scoped(
        body,
        ring=pltpu.VMEM((4, th + 2, w, c), dt),
        stage=pltpu.VMEM((th, w, c), dt),
        in_sem=pltpu.SemaphoreType.DMA((4,)),
        out_sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("th",))
def depthwise_conv3_ring(x: jnp.ndarray, w: jnp.ndarray, th: int = 32):
    """Ring-streamed depthwise 3x3x3 conv, stride 1, SAME (TPU only).

    :param x: (B, D, H, W, C); H must be divisible by `th`, D >= 2
    :param w: (3, 3, 3, C)
    """
    b, d, h, ww, c = x.shape
    if w.shape != (3, 3, 3, c):
        raise ValueError(f"weight shape {w.shape} != (3, 3, 3, {c})")
    if h % th or h // th < 2 or d < 2:
        raise ValueError(f"need H % th == 0, H/th >= 2, D >= 2; "
                         f"got H={h}, th={th}, D={d}")
    kernel = functools.partial(_dw_ring_kernel, d=d, th=th, w=ww, c=c)
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, d, h, ww, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret_mode(),
    )(x, w)


@functools.partial(jax.jit, static_argnames=("tc",))
def depthwise_conv3(x: jnp.ndarray, w: jnp.ndarray, tc: int = 64):
    """Depthwise 3x3x3 conv, stride 1, SAME padding.

    :param x: (B, D, H, W, C) feature map (bf16 or f32)
    :param w: (3, 3, 3, C) per-channel taps (flax Conv kernel squeezed)
    :return: (B, D, H, W, C), same dtype as x
    """
    b, d, h, ww, c = x.shape
    if w.shape != (3, 3, 3, c):
        raise ValueError(f"weight shape {w.shape} != (3, 3, 3, {c})")
    tc = min(tc, c)
    pad_c = (-c) % tc
    if pad_c:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, pad_c),))
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, pad_c),))
    cp = c + pad_c

    kernel = functools.partial(_dw_kernel, h=h, w=ww, tc=tc)
    grid = (b, d, cp // tc)
    spec = lambda dz: pl.BlockSpec(  # noqa: E731
        (1, 1, h, ww, tc),
        lambda i, j, k, _dz=dz: (i, jnp.clip(j + _dz, 0, d - 1), 0, 0, k),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec(-1), spec(0), spec(1),
            pl.BlockSpec((3, 3, 3, tc), lambda i, j, k: (0, 0, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, ww, tc),
                               lambda i, j, k: (i, j, 0, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, h, ww, cp), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * d * h * ww * cp * 54,
            bytes_accessed=x.dtype.itemsize * b * d * h * ww * cp * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(x, x, x, w)
    return out[..., :c] if pad_c else out
