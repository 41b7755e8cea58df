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

import jax.numpy as jnp


def gather_neighbors(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features.

    For batched inputs the gather is issued as ONE flat row-gather into the
    (B*N, C) matrix: XLA lowers this to a single contiguous-row dynamic
    gather, ~2x faster on TPU than the equivalent batched take_along_axis
    (which lowers to a general gather with batching dims).

    :param x: (..., N, C) per-point features
    :param idx: (..., N, k) int neighbor indices into the N axis
    :return: (..., N, k, C) neighbor features
    """
    if x.ndim == 3:
        b, n, c = x.shape
        k = idx.shape[-1]
        offs = (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
        flat = (idx + offs).reshape(-1)
        return x.reshape(b * n, c)[flat].reshape(b, n, k, c)
    return jnp.take_along_axis(x[..., None, :], idx[..., None], axis=-3)


def edge_features(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """DGCNN edge features ``concat([x_j - x_i, x_i])`` (dgcnn.py:30-36).

    :param x: (..., N, C) per-point features
    :param idx: (..., N, k) neighbor indices
    :return: (..., N, k, 2C) edge features
    """
    neigh = gather_neighbors(x, idx)
    center = jnp.broadcast_to(x[..., :, None, :], neigh.shape)
    return jnp.concatenate([neigh - center, center], axis=-1)
