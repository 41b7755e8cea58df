"""Farthest point sampling as a single Pallas kernel.

Replaces the pointops_cuda furthest-sampling kernel
(models/pointtransformer/pointops.py:16-39). The whole cloud and the running
min-distance field stay resident in VMEM across all m iterations — one
kernel launch, no HBM traffic for the state.

Layout note: the min-distance field is kept in native (N/128, 128) tiling —
a (1, N) row vector would be sublane-padded 8x and blow the scoped-vmem
limit for 20k-point clouds. Index selection uses a max-reduction trick
instead of argmax (Mosaic's argmax tie-break is unspecified; the reference
lax.argmax takes the first occurrence): max score g, then the largest value
of (N - flat_index) where score == g gives the smallest attaining index.

Semantics match ops/fps.py bit-for-bit (first selected index = first valid
point).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._config import interpret_mode

_NEG_INF = float("-inf")
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fps_kernel(pts_ref, valid_ref, out_ref, *, m: int, n_pad: int, c: int):
    rows = n_pad // _LANES
    # channel-major layout: pts_ref (1, C, rows, 128) so every plane is in
    # native (sublane, lane) tiling — a trailing C dim would be lane-padded
    # to 128 and use 40x the VMEM.
    valid = valid_ref[0] > 0               # (rows, 128) int32 -> bool
    flat = (jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES
            + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1))
    anti = (n_pad - flat).astype(jnp.float32)  # strictly decreasing > 0

    def first_argmax(score):
        """Flat index of the first occurrence of the maximum (f32 score)."""
        g = jnp.max(score)
        v = jnp.max(jnp.where(score == g, anti, 0.0))
        return (n_pad - v.astype(jnp.int32)).astype(jnp.int32)

    start = first_argmax(jnp.where(valid, 1.0, 0.0).astype(jnp.float32))
    out_col = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    selected = jnp.where(out_col == 0, start, 0)  # (1, m)

    def body(i, carry):
        last, selected, min_d = carry
        row, lane = last // _LANES, last % _LANES
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        d = jnp.zeros((rows, _LANES), jnp.float32)
        for ch in range(c):
            plane = pts_ref[0, ch]                         # (rows, 128)
            # dynamic sublane index is fine; a dynamic LANE index is not —
            # extract the selected lane with a one-hot reduction instead
            rowvec = pts_ref[0, ch, pl.ds(row, 1), :]      # (1, 128)
            sel = jnp.sum(jnp.where(lane_iota == lane, rowvec, 0.0))
            diff = plane - sel
            d = d + diff * diff
        min_d = jnp.minimum(min_d, d)
        score = jnp.where(valid, min_d, _NEG_INF)
        nxt = first_argmax(score)
        selected = jnp.where(out_col == i, nxt, selected)
        return nxt, selected, min_d

    init_mind = jnp.full((rows, _LANES), jnp.inf, jnp.float32)
    _, selected, _ = jax.lax.fori_loop(1, m, body,
                                       (start, selected, init_mind))
    out_ref[0] = selected


@functools.partial(jax.jit, static_argnames=("m",))
def fps_pallas(points: jnp.ndarray, m: int,
               mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Select m points maximizing the minimum pairwise distance.

    :param points: (B, N, C) or (N, C) float32
    :param mask: optional (B, N) validity
    :return: (B, m) (or (m,)) int32 indices
    """
    if points.ndim == 2:
        return fps_pallas(points[None], m,
                          None if mask is None else mask[None])[0]
    b, n, c = points.shape
    n_pad = _round_up(n, _LANES)
    rows = n_pad // _LANES
    pts = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, 0)))
    pts = jnp.moveaxis(pts, -1, 1).reshape(b, c, rows, _LANES)
    if mask is None:
        valid = jnp.ones((b, n), jnp.int32)
    else:
        valid = mask.astype(jnp.int32)
    valid = jnp.pad(valid, ((0, 0), (0, n_pad - n))).reshape(b, rows, _LANES)

    kernel = functools.partial(_fps_kernel, m=m, n_pad=n_pad, c=c)
    idx = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, rows, _LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
        interpret=interpret_mode(),
    )(pts, valid)
    return idx[:, 0, :]
