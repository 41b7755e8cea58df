"""Neighbor gathering and EdgeConv edge-feature assembly.

TPU-native counterpart of reference models/dgcnn.py:15-58
(`create_neighbor_features`): gather the k neighbors of every point and build
the DGCNN edge tensor ``[x_j - x_i, x_i]``.

Layout is channel-last: features (..., N, C), neighbor indices (..., N, k),
edge features (..., N, k, 2C). XLA lowers the gather to an efficient
dynamic-gather; the subsequent 1x1 "conv" in EdgeConv is then a plain matmul
over the last axis (MXU-friendly), instead of the reference's NCHW conv2d.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes

# VMEM budget for the one-hot-matmul scatter backward (per grid step:
# (tile, N) bf16 one-hot + (N, C_eff) f32 accumulator + (tile, C_eff) bf16
# payload, C_eff = 2C for the f32 hi/lo split). ~16 MB physical; leave
# headroom for Mosaic spills.
_MM_VMEM_BUDGET = 12 * 2 ** 20


def _mm_scatter_tile(n: int, c: int, is_f32: bool) -> int | None:
    """Largest kernel edge-tile whose VMEM footprint fits, or None when the
    shape cannot fit at any tile size (then the XLA scatter is used).
    Routing admits exactly what the kernel can compile — a guard on N/C
    alone admitted e.g. N=8192 whose one-hot at the default tile is 16.8 MB
    and crashed compilation instead of falling back."""
    c_eff = 2 * c if is_f32 else c
    acc = n * c_eff * 4
    for tile in (1024, 512, 256):
        if tile * n * 2 + acc + tile * c_eff * 2 <= _MM_VMEM_BUDGET:
            return tile
    return None


def _mm2_scatter_tile(n: int, c: int) -> int | None:
    """Edge tile for the two-level kernel (bf16 payloads): (tile, n_lo) bf16
    one-hot + ~2x (tile, n_hi*C) bf16 replicated/masked payload + the
    (n_lo, n_hi*C) f32 accumulator. v5e sweep at E=81920/N=2048/C=64:
    tile 2048 is best (12.9 ms vs 16.2 for the one-level kernel)."""
    from .pallas.scatter import pick_n_lo
    n_lo = pick_n_lo(n, c)
    n_hi = -(-n // n_lo)
    acc = n_lo * n_hi * c * 4
    for tile in (2048, 1024, 512, 256):
        if tile * n_lo * 2 + 2 * tile * n_hi * c * 2 + acc + tile * c * 2 \
                <= _MM_VMEM_BUDGET:
            return tile
    return None


def _flat_gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    b, n, c = x.shape
    k = idx.shape[-1]
    offs = (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
    flat = (idx + offs).reshape(-1)
    return x.reshape(b * n, c)[flat].reshape(b, n, k, c)


@jax.custom_vjp
def _gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return _flat_gather(x, idx)


def _gather_rows_fwd(x, idx):
    return _flat_gather(x, idx), idx


def _gather_rows_bwd(idx, ct):
    # The transpose of the neighbor gather is a (B*N*k)-row scatter-add:
    # XLA serializes it at ~19 GB/s and it dominates the DGCNN train step
    # (~72 ms/step of a 196 ms step at B=32, N=2048, k=40). Reformulated as
    # one-hot matmuls it rides the otherwise-idle MXU (ops/pallas/scatter.py).
    # Off-TPU the plain XLA scatter is used (interpret-mode Pallas would only
    # slow CPU tests); the kernel itself is parity-tested in interpret mode.
    b, n, k, c = ct.shape
    xdtype = ct.dtype
    e = n * k
    ct2 = ct.reshape(b, e, c)
    on_tpu = jax.default_backend() == "tpu"
    is_f32 = xdtype == jnp.float32
    # bf16 payloads route through the two-level kernel (v5e at the canonical
    # config: 12.9 ms vs 16.2 one-level); the f32 hi/lo split measured
    # slightly WORSE two-level (18.8 vs 18.4) so f32 keeps the one-level.
    tile2 = _mm2_scatter_tile(n, c) if on_tpu and not is_f32 else None
    tile_e = _mm_scatter_tile(n, c, is_f32) if on_tpu else None
    if tile2 is not None:
        from .pallas.scatter import scatter_add_mm2
        dx = scatter_add_mm2(idx.reshape(b, e), ct2, n, tile_e=tile2)
    elif tile_e is not None:
        from .pallas.scatter import scatter_add_mm
        dx = scatter_add_mm(idx.reshape(b, e), ct2, n, tile_e=tile_e)
    else:
        dx = jnp.zeros((b, n, c), jnp.float32).at[
            jnp.arange(b)[:, None], idx.reshape(b, e)].add(
                ct2.astype(jnp.float32))
    return dx.astype(xdtype), np.zeros(idx.shape, dtypes.float0)


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def gather_neighbors(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features.

    For batched inputs the gather is issued as ONE flat row-gather into the
    (B*N, C) matrix: XLA lowers this to a single contiguous-row dynamic
    gather, ~2x faster on TPU than the equivalent batched take_along_axis
    (which lowers to a general gather with batching dims). The backward is a
    custom VJP running the scatter-add as one-hot MXU matmuls (see
    ops/pallas/scatter.py for the measured rationale).

    :param x: (..., N, C) per-point features
    :param idx: (..., N, k) int neighbor indices into the N axis
    :return: (..., N, k, C) neighbor features
    """
    if x.ndim == 2:
        return jnp.take_along_axis(x[..., None, :], idx[..., None], axis=-3)
    lead = x.shape[:-2]
    n, c = x.shape[-2:]
    k = idx.shape[-1]
    out = _gather_rows(x.reshape(-1, n, c), idx.reshape(-1, n, k))
    return out.reshape(*lead, n, k, c)


def edge_features(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """DGCNN edge features ``concat([x_j - x_i, x_i])`` (dgcnn.py:30-36).

    :param x: (..., N, C) per-point features
    :param idx: (..., N, k) neighbor indices
    :return: (..., N, k, 2C) edge features
    """
    neigh = gather_neighbors(x, idx)
    center = jnp.broadcast_to(x[..., :, None, :], neigh.shape)
    return jnp.concatenate([neigh - center, center], axis=-1)


def edge_mlp_pre_gather(x: jnp.ndarray, idx: jnp.ndarray,
                        w: jnp.ndarray) -> jnp.ndarray:
    """``edge_features(x, idx) @ w`` with the matmul commuted BEFORE the
    gather (algebraic fission of EdgeConv's first shared-MLP layer).

    With ``w = [w_d; w_c]`` (diff / center halves), the edge Dense

        concat([x_j - x_i, x_i]) @ w  ==  (x @ w_d)[idx]  +  x @ (w_c - w_d)

    so the matmul runs over N rows instead of N*k, and the (..., N, k, 2C)
    edge tensor is never materialized — only the (..., N, k, F) gather of the
    pre-projected features. At the DGCNN canonical config this cuts the
    EdgeConv forward HBM traffic roughly in half and removes a k-times
    redundant MXU pass (reference hot path: models/dgcnn.py:15-36 builds the
    edge tensor explicitly and convolves it).

    :param x: (..., N, C) per-point features
    :param idx: (..., N, k) neighbor indices
    :param w: (2C, F) edge-Dense kernel (rows [:C] multiply ``x_j - x_i``,
        rows [C:] multiply ``x_i`` — same layout as the explicit path)
    :return: (..., N, k, F) pre-activation edge responses
    """
    c = x.shape[-1]
    if w.shape[0] != 2 * c:
        raise ValueError(f"kernel rows {w.shape[0]} != 2*C ({2 * c})")
    a = x @ w[:c]
    center = x @ (w[c:] - w[:c])
    return gather_neighbors(a, idx) + center[..., :, None, :]
