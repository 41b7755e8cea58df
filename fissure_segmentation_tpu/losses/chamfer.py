"""Chamfer distance between point clouds.

Counterpart of reference losses/chamfer_loss.py:5-20 (pytorch3d
`chamfer_distance` with default reductions): squared euclidean nearest-
neighbor distances, mean over points in each direction, directions summed,
mean over batch. Channel-last (B, N, 3) clouds.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.knn import pairwise_sqdist


def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray,
                     x_mask: jnp.ndarray | None = None,
                     y_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Symmetric squared-distance Chamfer, (B, N, 3) x (B, M, 3) -> scalar.

    Optional boolean masks (B, N)/(B, M) exclude padded points — needed for
    fixed-shape TPU pipelines where clouds are padded to a static size.
    """
    d = jnp.maximum(pairwise_sqdist(x, y), 0.0)  # clamp fp noise, (B, N, M)
    big = jnp.asarray(jnp.inf, d.dtype)
    if y_mask is not None:
        d = jnp.where(y_mask[..., None, :], d, big)
    if x_mask is not None:
        d = jnp.where(x_mask[..., None], d, big)

    min_xy = jnp.min(d, axis=-1)  # (B, N) nearest-y for each x
    min_yx = jnp.min(d, axis=-2)  # (B, M)
    if x_mask is not None:
        cham_x = jnp.sum(jnp.where(x_mask, min_xy, 0), -1) / jnp.maximum(x_mask.sum(-1), 1)
    else:
        cham_x = min_xy.mean(-1)
    if y_mask is not None:
        cham_y = jnp.sum(jnp.where(y_mask, min_yx, 0), -1) / jnp.maximum(y_mask.sum(-1), 1)
    else:
        cham_y = min_yx.mean(-1)
    return (cham_x + cham_y).mean()


def chamfer_loss(prediction: jnp.ndarray, target: jnp.ndarray):
    loss = chamfer_distance(prediction, target)
    return loss, {"Chamfer": loss}
