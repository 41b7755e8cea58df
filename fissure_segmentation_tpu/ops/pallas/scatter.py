"""Scatter-add as one-hot MXU matmuls — the EdgeConv gather backward.

The training hot spot of the DGCNN family is NOT the matmuls: a per-step
trace of the canonical config (batch 32, 2048 pts, k=40) shows XLA's
scatter-add in the neighbor-gather backward costing ~36 ms per EdgeConv
(~45 ms standalone for 2.6M x 64 updates, ~19 GB/s effective) while every
MXU op is <4 ms. XLA's scatter serializes random 256-B row updates; sorting
doesn't help (sorted segment-sum: 68 ms) because any random access into the
671 MB edge tensor runs at ~18 GB/s.

This kernel instead reformulates scatter-add as dense matmuls: for each
tile of R edges, build the (R, N) one-hot target matrix in VMEM and
accumulate ``one_hot^T @ g_tile`` into an (N, C) VMEM accumulator — all
redundant FLOPs land on the otherwise-idle MXU. For B=32, E=81920, N=2048,
C=64 that is 687 GFLOP in bf16 — a few ms at MXU rate vs 45 ms for the
serialized scatter.

Precision: one-hot entries are exact in bf16. bf16 payloads lose nothing
vs an XLA bf16 scatter. float32 payloads are split into hi + lo bf16 halves
(two matmuls, f32 accumulation) giving ~16 mantissa bits — relative error
~1e-5 vs the exact f32 scatter (validated in tests); pass exact=True to
run the one-hot matmul in f32 precision instead (3 passes, slower).

Applicability: needs the (N, C) accumulator + (R, N) one-hot to fit VMEM —
n_rows <= ~8192 and C <= ~512, which covers every point-cloud model here
(clouds are <= 2048 points per forward; full-cloud ensembling batches
subsets, not points).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._config import interpret_mode


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# VMEM budget for tile-size selection (~16 MB physical; leave headroom for
# Mosaic spills) — mirrors ops/edge.py's routing budget.
_MM_VMEM_BUDGET = 12 * 2 ** 20


def pick_n_lo(n_rows: int, c_eff: int) -> int:
    """Low-part modulus minimizing the per-edge lane cost n_lo + n_hi*c_eff
    of :func:`scatter_add_mm2`. Ties break toward the LARGER n_lo: at the
    canonical N=2048/C=64 both 256 and 512 cost 768 lanes, but 512 measured
    ~4% faster on v5e (fewer payload replication blocks)."""
    best = None
    for cand in range(128, _round_up(n_rows, 128) + 1, 128):
        n_hi = -(-n_rows // cand)
        cost = cand + n_hi * c_eff
        if best is None or cost <= best[0]:
            best = (cost, cand)
    return best[1]


def _kernel(idx_ref, g_ref, out_ref, *, r: int, n: int, split: bool,
            f32_dot: bool):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    tgt = idx_ref[0]                                        # (R, 1) int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    if f32_dot:
        onehot = (cols == tgt).astype(jnp.float32)
        g = g_ref[0]
        out_ref[0] += jax.lax.dot_general(
            onehot, g, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return
    onehot = (cols == tgt).astype(jnp.bfloat16)
    g = g_ref[0]
    if split:
        # f32 -> hi + lo bf16 halves, CONCATENATED along channels so the
        # split costs ONE full-width dot instead of two half-width ones
        # (C=64 alone fills only half the 128-wide MXU); the caller sums
        # out[..., :C] + out[..., C:] after the grid.
        hi = g.astype(jnp.bfloat16)
        lo = (g - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        g = jnp.concatenate([hi, lo], axis=-1)
    else:
        g = g.astype(jnp.bfloat16)
    out_ref[0] += jax.lax.dot_general(onehot, g, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)


def _kernel2(idx_ref, g_ref, out_ref, *, r: int, n_lo: int, n_hi: int,
             split: bool):
    """Two-level one-hot scatter tile: target row m = bkt*n_lo + lane.

    Instead of an (R, N) one-hot (whose VMEM materialization + VPU compare
    cost dominates _kernel at N=2048), build an (R, n_lo) one-hot over the
    low part of the index and replicate the payload into n_hi channel
    blocks masked by the high part. One dot then lands every edge in an
    (n_lo, n_hi*C) accumulator; the caller un-interleaves blocks back to
    row order. FLOPs are identical (R*n_lo*n_hi*C = R*N*C) but the
    per-edge VPU/VMEM cost drops from N to n_lo + n_hi*C lanes.
    """
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    tgt = idx_ref[0]                                    # (R, 1) int32
    lane = jax.lax.rem(tgt, n_lo)
    bkt = jax.lax.div(tgt, n_lo)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, n_lo), 1)
    onehot = (cols == lane).astype(jnp.bfloat16)
    g = g_ref[0]
    if split:
        g_hi = g.astype(jnp.bfloat16)
        g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        g = jnp.concatenate([g_hi, g_lo], axis=-1)
    else:
        g = g.astype(jnp.bfloat16)
    c_eff = g.shape[-1]
    rep = jnp.concatenate([g] * n_hi, axis=-1)          # (R, n_hi*c_eff)
    blk = jax.lax.broadcasted_iota(jnp.int32, (r, n_hi * c_eff), 1) // c_eff
    p = jnp.where(blk == bkt, rep, jnp.zeros_like(rep))
    out_ref[0] += jax.lax.dot_general(onehot, p, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_rows", "tile_e", "n_lo"))
def scatter_add_mm2(idx: jnp.ndarray, g: jnp.ndarray, n_rows: int,
                    tile_e: int = 1024, n_lo: int | None = None) -> jnp.ndarray:
    """Two-level variant of :func:`scatter_add_mm` (see _kernel2).

    :param n_lo: low-part modulus (lane width of the one-hot); multiple of
        128. Default: the multiple of 128 minimizing n_lo + n_hi*c_eff —
        the per-edge lane cost of the kernel.
    :return: (B, n_rows, C) float32
    """
    b, e = idx.shape
    c = g.shape[-1]
    if g.shape[:2] != (b, e):
        raise ValueError(f"idx {idx.shape} vs g {g.shape}")
    split = g.dtype == jnp.float32
    c_eff = 2 * c if split else c
    if n_lo is None:
        n_lo = pick_n_lo(n_rows, c_eff)
    n_hi = -(-n_rows // n_lo)

    e_pad = _round_up(e, tile_e)
    if e_pad != e:
        # pad targets land at row n_hi*n_lo - 1 with zero payload -> no-op
        idx = jnp.concatenate(
            [idx, jnp.full((b, e_pad - e), n_hi * n_lo - 1, idx.dtype)],
            axis=1)
        g = jnp.concatenate(
            [g, jnp.zeros((b, e_pad - e, c), g.dtype)], axis=1)

    grid = (b, e_pad // tile_e)
    kernel = functools.partial(_kernel2, r=tile_e, n_lo=n_lo, n_hi=n_hi,
                               split=split)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_e, 1), lambda bi, ei: (bi, ei, 0)),
            pl.BlockSpec((1, tile_e, c), lambda bi, ei: (bi, ei, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_lo, n_hi * c_eff),
                               lambda bi, ei: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_lo, n_hi * c_eff), jnp.float32),
        interpret=interpret_mode(),
    )(idx[..., None], g)
    # (B, n_lo, n_hi, c_eff) -> (B, n_hi*n_lo, c_eff): block h holds rows
    # {m : m // n_lo == h}, laid out by lane = m % n_lo
    out = out.reshape(b, n_lo, n_hi, c_eff).swapaxes(1, 2).reshape(
        b, n_hi * n_lo, c_eff)[:, :n_rows]
    if split:
        out = out[..., :c] + out[..., c:]
    return out


def _kernel_routed(idx_ref, ks_ref, s_ref, p_ref, out_ref, *, tile_n: int,
                   kk: int, n_lo: int, n_hi: int, c: int, split: bool):
    """Payload-SYNTHESIZING two-level scatter tile (see scatter_add_routed).

    The classic scatter kernels above stream a materialized (E, C) payload
    from HBM — 335 MB at the canonical DGCNN config, a ~4.4 ms read floor.
    Here the per-edge payload is built IN VMEM from two (N, C) node fields:

      payload[e=(n,k), 0:c]  = s[n, c]  if kstar[n, c] == k else 0
      payload[e=(n,k), c:2c] = p[n, c]                (k-replicated)

    which is exactly the EdgeConv max-backward: the max-pool routes the
    (B, N, C) cotangent to ONE edge per (n, c) (the argmax slot), and the
    BatchNorm backward adds a dense per-node term — so the (B, N, k, C)
    cotangent never exists in HBM. Reads per tile are three (tile_n, C)
    node blocks instead of a (tile_n*k, C) edge block.
    """
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    tile_e = tile_n * kk
    tgt = idx_ref[0]                                    # (tile_e, 1) int32
    lane = jax.lax.rem(tgt, n_lo)
    bkt = jax.lax.div(tgt, n_lo)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_e, n_lo), 1)
    onehot = (cols == lane).astype(jnp.bfloat16)

    ks = ks_ref[0]                                      # (tile_n, c) int32
    s = s_ref[0]                                        # (tile_n, c)
    p = p_ref[0]                                        # (tile_n, c)
    # Edge row e = k * tile_n + n_local (k-MAJOR within the tile; the caller
    # permutes idx to match), so node fields replicate by sublane concat and
    # the slot id is e // tile_n — all rank-2. The (tile_n, 1, c) middle-axis
    # broadcast this replaces has no Mosaic layout ("unsupported shape cast").
    s_rep = jnp.concatenate([s] * kk, axis=0)           # (tile_e, c)
    ks_rep = jnp.concatenate([ks] * kk, axis=0)
    pd = jnp.concatenate([p] * kk, axis=0)
    kio = jax.lax.broadcasted_iota(jnp.int32, (tile_e, c), 0) // tile_n
    sp = jnp.where(ks_rep == kio, s_rep, jnp.zeros_like(s_rep))
    pay = jnp.concatenate([sp, pd], axis=-1)            # (tile_e, 2c)
    if split:
        hi = pay.astype(jnp.bfloat16)
        lo = (pay.astype(jnp.float32) - hi.astype(jnp.float32)
              ).astype(jnp.bfloat16)
        pay = jnp.concatenate([hi, lo], axis=-1)
    else:
        pay = pay.astype(jnp.bfloat16)
    c_eff = pay.shape[-1]
    rep = jnp.concatenate([pay] * n_hi, axis=-1)        # (tile_e, n_hi*c_eff)
    blk = jax.lax.broadcasted_iota(jnp.int32, (tile_e, n_hi * c_eff), 1) \
        // c_eff
    masked = jnp.where(blk == bkt, rep, jnp.zeros_like(rep))
    out_ref[0] += jax.lax.dot_general(
        onehot, masked, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _routed_tile_n(n: int, kk: int, c: int, n_lo: int, n_hi: int,
                   c_eff: int) -> int | None:
    """Largest node tile (divisor of N) fitting the VMEM budget."""
    acc = n_lo * n_hi * c_eff * 4
    for tile_n in (64, 32, 16, 8, 4, 2, 1):
        if n % tile_n:
            continue
        tile_e = tile_n * kk
        # onehot + replicated/masked payload (x2) + payload build + acc
        need = (tile_e * n_lo * 2 + 2 * tile_e * n_hi * c_eff * 2
                + 4 * tile_n * kk * max(c, 128) * 2 + acc)
        if need <= _MM_VMEM_BUDGET:
            return tile_n
    return None


@functools.partial(jax.jit, static_argnames=("n_rows", "tile_n"))
def scatter_add_routed(idx: jnp.ndarray, kstar: jnp.ndarray, s: jnp.ndarray,
                       p: jnp.ndarray, n_rows: int,
                       tile_n: int | None = None) -> jnp.ndarray:
    """Fused sparse+dense scatter with IN-KERNEL payload synthesis.

    For every node n and channel c:
      out[b, idx[b, n, kstar[b, n, c]], c]      += s[b, n, c]   (sparse half)
      out[b, idx[b, n, k], c + C]  for ALL k    += p[b, n, c]   (dense half)

    :param idx: (B, N, K) int32 neighbor indices in [0, n_rows)
    :param kstar: (B, N, C) int32 routing slot in [0, K) per (node, channel)
    :param s: (B, N, C) sparse payload (bf16 or f32)
    :param p: (B, N, C) dense (k-replicated) payload, same dtype as s
    :return: (B, n_rows, 2C) float32 — [..., :C] sparse, [..., C:] dense
    """
    b, n, kk = idx.shape
    c = s.shape[-1]
    if s.shape != (b, n, c) or p.shape != (b, n, c) or kstar.shape != s.shape:
        raise ValueError(f"idx {idx.shape} / kstar {kstar.shape} / "
                         f"s {s.shape} / p {p.shape}")
    split = s.dtype == jnp.float32
    c_eff = 4 * c if split else 2 * c
    n_lo = pick_n_lo(n_rows, c_eff)
    n_hi = -(-n_rows // n_lo)
    if tile_n is None:
        tile_n = _routed_tile_n(n, kk, c, n_lo, n_hi, c_eff)
    if tile_n is None:
        raise ValueError(f"no VMEM-feasible tile for N={n} K={kk} C={c}")

    grid = (b, n // tile_n)
    kernel = functools.partial(_kernel_routed, tile_n=tile_n, kk=kk,
                               n_lo=n_lo, n_hi=n_hi, c=c, split=split)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n * kk, 1), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, tile_n, c), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, tile_n, c), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, tile_n, c), lambda bi, ni: (bi, ni, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_lo, n_hi * c_eff),
                               lambda bi, ni: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_lo, n_hi * c_eff), jnp.float32),
        interpret=interpret_mode(),
    )(idx.reshape(b, n // tile_n, tile_n, kk).swapaxes(2, 3)
        .reshape(b, n * kk, 1), kstar, s, p)
    out = out.reshape(b, n_lo, n_hi, c_eff).swapaxes(1, 2).reshape(
        b, n_hi * n_lo, c_eff)[:, :n_rows]
    if split:
        return jnp.concatenate([out[..., :c] + out[..., 2 * c:3 * c],
                                out[..., c:2 * c] + out[..., 3 * c:]], -1)
    return out


def _kernel_count(idx_ref, out_ref, *, r: int, n_lo: int, n_hi: int):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    tgt = idx_ref[0]                                    # (r, 1) int32
    lane = jax.lax.rem(tgt, n_lo)
    bkt = jax.lax.div(tgt, n_lo)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, n_lo), 1)
    onehot = (cols == lane).astype(jnp.bfloat16)
    hcols = jax.lax.broadcasted_iota(jnp.int32, (r, n_hi), 1)
    bh = (hcols == bkt).astype(jnp.bfloat16)
    out_ref[0] += jax.lax.dot_general(onehot, bh, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_rows", "tile_e"))
def scatter_count(idx: jnp.ndarray, n_rows: int,
                  tile_e: int = 2048) -> jnp.ndarray:
    """Per-row multiplicity of ``idx`` (the kNN-graph in-degree).

    out[b, m] = #{e : idx[b, e] == m} — the one-hot column sums, computed as
    a (R, n_lo)^T @ (R, n_hi) dot so the histogram lands on the MXU instead
    of XLA's latency-bound element scatter (43.8 ms for ANY size, PERF.md).

    :param idx: (B, E) int32 targets in [0, n_rows)
    :return: (B, n_rows) float32 counts
    """
    b, e = idx.shape
    n_lo = pick_n_lo(n_rows, 8)
    n_hi = -(-n_rows // n_lo)
    e_pad = _round_up(e, tile_e)
    if e_pad != e:
        idx = jnp.concatenate(
            [idx, jnp.full((b, e_pad - e), n_hi * n_lo - 1, idx.dtype)],
            axis=1)
    grid = (b, e_pad // tile_e)
    kernel = functools.partial(_kernel_count, r=tile_e, n_lo=n_lo, n_hi=n_hi)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_e, 1), lambda bi, ei: (bi, ei, 0))],
        out_specs=pl.BlockSpec((1, n_lo, n_hi), lambda bi, ei: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_lo, n_hi), jnp.float32),
        interpret=interpret_mode(),
    )(idx[..., None])
    if e_pad != e:
        pad_count = jnp.zeros((b, n_lo, n_hi), jnp.float32).at[
            :, (n_hi * n_lo - 1) % n_lo, n_hi - 1].add(float(e_pad - e))
        out = out - pad_count
    return out.swapaxes(1, 2).reshape(b, n_hi * n_lo)[:, :n_rows]


@functools.partial(jax.jit, static_argnames=("n_rows", "tile_e", "exact"))
def scatter_add_mm(idx: jnp.ndarray, g: jnp.ndarray, n_rows: int,
                   tile_e: int = 1024, exact: bool = False) -> jnp.ndarray:
    """out[b, idx[b, e]] += g[b, e] on the MXU.

    :param idx: (B, E) int32 target rows in [0, n_rows)
    :param g: (B, E, C) payloads (float32 or bfloat16)
    :param exact: run the one-hot matmul at f32 precision (exact, slower);
        default splits f32 payloads into hi+lo bf16 (~1e-5 rel. error)
    :param tile_e: edge rows per grid step. Sweep on v5e (E=81920, N=2048,
        C=64, B=32): 256 is pathological (grid overhead), 512/1024/2048 all
        ~24-26 ms; 4096 exceeds the 16 MB scoped-VMEM limit. 1024 keeps
        2x headroom under the limit. The ~24 ms plateau is the VPU-bound
        one-hot build (B*E*N comparisons), not the MXU dots.
    :return: (B, n_rows, C) float32
    """
    b, e = idx.shape
    c = g.shape[-1]
    if g.shape[:2] != (b, e):
        raise ValueError(f"idx {idx.shape} vs g {g.shape}")
    e_pad = _round_up(e, tile_e)
    if e_pad != e:
        # pad with out-of-range target -> contributes no one-hot column
        idx = jnp.concatenate(
            [idx, jnp.full((b, e_pad - e), n_rows, idx.dtype)], axis=1)
        g = jnp.concatenate(
            [g, jnp.zeros((b, e_pad - e, c), g.dtype)], axis=1)

    grid = (b, e_pad // tile_e)
    split = g.dtype == jnp.float32 and not exact
    c_out = 2 * c if split else c
    kernel = functools.partial(_kernel, r=tile_e, n=n_rows, split=split,
                               f32_dot=exact)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_e, 1), lambda bi, ei: (bi, ei, 0)),
            pl.BlockSpec((1, tile_e, c), lambda bi, ei: (bi, ei, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_rows, c_out), lambda bi, ei: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_rows, c_out), jnp.float32),
        interpret=interpret_mode(),
    )(idx[..., None], g)
    if split:
        out = out[..., :c] + out[..., c:]
    return out
