"""Batched point-cloud neighborhood ops: kNN query, query-and-group,
inverse-distance interpolation.

TPU-native replacements for the `pointops_cuda` extension used by the
PointTransformer (models/pointtransformer/pointops.py: KNNQuery:42,
queryandgroup:100, interpolation:198). The reference packs varying-size
clouds into one axis with offset vectors (CUDA-kernel-friendly); here clouds
are batched fixed-shape (B, N, ...), so every op is a matmul-based distance
+ top-k + gather — no custom backward needed, XLA transposes gathers into
scatters automatically.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .knn import pairwise_sqdist


@functools.partial(jax.jit, static_argnames=("k",))
def knn_query(support_xyz: jnp.ndarray, query_xyz: jnp.ndarray, k: int):
    """k nearest support points of each query point (self included when the
    query coincides with a support point — pointops KNNQuery semantics).

    :return: (idx (B, M, k) int32, dist (B, M, k) *euclidean* distances)
    """
    n = support_xyz.shape[-2]
    d = pairwise_sqdist(query_xyz, support_xyz)  # (B, M, N)
    neg, idx = jax.lax.top_k(-d, min(k, n))
    if k > n:  # pad with repeats of the nearest neighbor (CUDA kernel pads
        # with duplicates when a cloud has fewer than nsample points)
        pad = k - n
        idx = jnp.concatenate([idx, jnp.repeat(idx[..., :1], pad, -1)], -1)
        neg = jnp.concatenate([neg, jnp.repeat(neg[..., :1], pad, -1)], -1)
    return idx, jnp.sqrt(jnp.maximum(-neg, 0.0))


def query_and_group(support_xyz: jnp.ndarray, query_xyz: jnp.ndarray,
                    feat: jnp.ndarray, nsample: int, idx=None,
                    use_xyz: bool = True):
    """Group features of the nsample nearest support points per query
    (pointops.queryandgroup:100-123).

    :param feat: (B, N, C) support features
    :return: (B, M, nsample, 3+C) if use_xyz (relative xyz first) else
        (B, M, nsample, C) [, idx]
    """
    if idx is None:
        idx, _ = knn_query(support_xyz, query_xyz, nsample)
    grouped_xyz = jnp.take_along_axis(support_xyz[..., None, :],
                                      idx[..., None], axis=-3)
    grouped_xyz = grouped_xyz - query_xyz[..., None, :]
    grouped_feat = jnp.take_along_axis(feat[..., None, :], idx[..., None], axis=-3)
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1), idx
    return grouped_feat, idx


@functools.partial(jax.jit, static_argnames=("k",))
def interpolate(coarse_xyz: jnp.ndarray, fine_xyz: jnp.ndarray,
                coarse_feat: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Inverse-distance weighted k-NN interpolation from a coarse onto a
    fine point set (pointops.interpolation:198-216).

    :return: (B, N_fine, C)
    """
    idx, dist = knn_query(coarse_xyz, fine_xyz, k)
    w = 1.0 / (dist + 1e-8)
    w = w / w.sum(axis=-1, keepdims=True)
    neigh = jnp.take_along_axis(coarse_feat[..., None, :], idx[..., None], axis=-3)
    return jnp.sum(neigh * w[..., None], axis=-2)
