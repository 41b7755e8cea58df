"""Brute-force k-nearest-neighbor graph construction.

TPU-native counterpart of reference utils/general_utils.py:315-327 (`knn`) and
:43-53 (`pairwise_dist`). The pairwise distance is computed as a single large
matmul (MXU work); top-k runs in XLA. For large clouds, queries are processed
in chunks so the full N×N distance matrix never materializes (the reference
dodges this by subsampling to 2048 points — we don't have to).

Semantics (matching the reference):
  * squared euclidean distances, diagonal forced to 0,
  * `self_loop=True`  -> the point itself is included as its first neighbor,
  * `self_loop=False` -> top-(k+1) computed, first neighbor dropped.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray | None = None) -> jnp.ndarray:
    """Squared euclidean distance matrix.

    :param x: (..., N, C) points
    :param y: (..., M, C) points (defaults to x; the diagonal is then zeroed,
        parity with general_utils.py:43-53)
    :return: (..., N, M) squared distances
    """
    self_dist = y is None
    if y is None:
        y = x
    xx = jnp.sum(x * x, axis=-1, keepdims=True)
    yy = jnp.sum(y * y, axis=-1, keepdims=True)
    # One matmul — this is the MXU-heavy part.
    d = (xx - 2.0 * jnp.einsum("...nc,...mc->...nm", x, y,
                               precision=jax.lax.Precision.HIGHEST)
         + jnp.swapaxes(yy, -1, -2))
    if self_dist:
        n = x.shape[-2]
        eye = jnp.eye(n, dtype=bool)
        d = jnp.where(eye, 0.0, d)
    return d


@functools.partial(jax.jit, static_argnames=("k", "self_loop", "return_dist",
                                              "query_chunk", "use_pallas",
                                              "recall_target"))
def knn(x: jnp.ndarray, k: int, self_loop: bool = False, return_dist: bool = False,
        query_chunk: int | None = None, use_pallas: bool | None = None,
        recall_target: float | None = None):
    """k nearest neighbors of every point within its own cloud.

    :param x: (..., N, C) point cloud batch (channel-last!). Note the
        reference takes (B, C, N); we keep channel-last throughout.
    :param k: number of neighbors
    :param self_loop: include the point itself as a neighbor
    :param query_chunk: process queries in chunks of this size to bound the
        distance-matrix memory to (..., query_chunk, N). Must divide N.
    :param use_pallas: route to the fused Pallas kernel
        (ops/pallas/knn.py). Default (None): auto — on TPU, for <=3-D
        inputs with few channels (coordinate graphs), where the fused
        kernel is 2-11x faster than materialize+top_k. Pallas distances
        may differ from this path by ~1 ulp (different but algebraically
        equal formula), which can swap near-exact ties.
    :param recall_target: opt-in APPROXIMATE graph build: materialize the
        distance matrix and select with `lax.approx_min_k` at this
        per-neighbor recall (e.g. 0.95). TPU's PartialReduce lowering makes
        this ~8x faster than the exact Pallas select at the canonical
        DGCNN config. The self point is always recalled exactly (its
        distance is pinned below/above the rest), so `self_loop` semantics
        are preserved. Neighbor ORDER is approximate; downstream EdgeConv
        max-pools over k, so training is insensitive (the reference's own
        graphs are stochastic — random 2048-pt subsets per step).
    :return: (..., N, k) int32 neighbor indices [, (..., N, k) distances]
    """
    n = x.shape[-2]
    kk = k if self_loop else k + 1
    if recall_target is not None:
        d = pairwise_sqdist(x, x)
        eye = jnp.eye(n, dtype=bool)
        if self_loop:
            # pin self strictly below every true distance -> always recalled
            # and sorted first (reference puts self at slot 0 with dist 0)
            d = jnp.where(eye, -1.0, d)
            dist, idx = jax.lax.approx_min_k(d, k,
                                             recall_target=recall_target)
            dist = jnp.where(dist < 0.0, 0.0, dist)
        else:
            d = jnp.where(eye, jnp.inf, d)
            dist, idx = jax.lax.approx_min_k(d, k,
                                             recall_target=recall_target)
        if return_dist:
            return idx.astype(jnp.int32), dist
        return idx.astype(jnp.int32)
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu" and x.ndim <= 3
                      and x.shape[-1] <= 8 and kk <= 128 and kk <= n
                      and query_chunk is None)
    if use_pallas:
        from .pallas.knn import knn_pallas
        return knn_pallas(x, k, self_loop=self_loop, return_dist=return_dist)

    def _topk_block(xq, xall, zero_diag_offset):
        d = pairwise_sqdist(xq, xall)
        if zero_diag_offset is not None:
            nq = xq.shape[-2]
            rows = jnp.arange(nq)
            cols = rows + zero_diag_offset
            d = d.at[..., rows, cols].set(0.0)
        neg_top, idx = jax.lax.top_k(-d, kk)
        return idx, -neg_top

    if query_chunk is None or query_chunk >= n:
        idx, dist = _topk_block(x, x, 0)
    else:
        if n % query_chunk:
            raise ValueError(f"query_chunk {query_chunk} must divide N={n}")
        batch_shape = x.shape[:-2]
        xs = x.reshape(*batch_shape, n // query_chunk, query_chunk, x.shape[-1])
        xs = jnp.moveaxis(xs, -3, 0)  # (num_chunks, ..., qc, C)
        offs = jnp.arange(n // query_chunk) * query_chunk

        def body(carry, inp):
            xq, off = inp
            i, dd = _topk_block(xq, x, off)
            return carry, (i, dd)

        _, (idx, dist) = jax.lax.scan(body, None, (xs, offs))
        idx = jnp.moveaxis(idx, 0, -3).reshape(*batch_shape, n, kk)
        dist = jnp.moveaxis(dist, 0, -3).reshape(*batch_shape, n, kk)

    if not self_loop:
        idx, dist = idx[..., 1:], dist[..., 1:]
    if return_dist:
        return idx, dist
    return idx
