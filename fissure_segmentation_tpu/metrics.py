"""Evaluation metrics: label Dice, binary recall/precision, point-to-surface
distances (ASSD / SDSD / HD / HD95).

Counterpart of reference metrics.py. The reference computes point->mesh
distances with Open3D's C++ RaycastingScene (metrics.py:11-25); here the
distance is an exact point-to-triangle distance computed on device in XLA
(chunked over query points x triangles) — no host library, differentiable if
ever needed, and vmappable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def batch_dice(prediction: jnp.ndarray, target: jnp.ndarray, n_labels: int) -> jnp.ndarray:
    """Per-class hard Dice, averaged over the batch (metrics.py:130-142).

    :param prediction: (B, ...) int labels
    :param target: (B, ...) int labels
    :return: (n_labels,) mean dice per class
    """
    pred = prediction.reshape(prediction.shape[0], -1)
    targ = target.reshape(target.shape[0], -1)
    dice = []
    for l in range(n_labels):
        lp = pred == l
        lt = targ == l
        inter = (lp & lt).sum(-1)
        dice.append(2 * inter / (lp.sum(-1) + lt.sum(-1) + 1e-8))
    return jnp.stack(dice, axis=1).mean(0)


def binary_recall(prediction: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """(metrics.py:144-148); inputs (B, ...) labels, 0 = background."""
    p = (prediction != 0).reshape(prediction.shape[0], -1)
    t = (target != 0).reshape(target.shape[0], -1)
    return ((p & t).sum(-1) + 1e-8) / (t.sum(-1) + 1e-8)


def binary_precision(prediction: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """(metrics.py:151-153)"""
    p = (prediction != 0).reshape(prediction.shape[0], -1)
    t = (target != 0).reshape(target.shape[0], -1)
    return ((p & t).sum(-1) + 1e-8) / (p.sum(-1) + 1e-8)


def _point_triangle_sqdist(p: jnp.ndarray, v0, v1, v2):
    """Exact squared distance from points (N, 3) to one triangle (3,) each of
    v0/v1/v2 broadcastable — classic Eberly region decomposition, vector form.

    All args broadcast: p (..., 3), triangle verts (..., 3).
    """
    e0 = v1 - v0
    e1 = v2 - v0
    d = v0 - p
    a = (e0 * e0).sum(-1)
    b = (e0 * e1).sum(-1)
    c = (e1 * e1).sum(-1)
    dd = (e0 * d).sum(-1)
    e = (e1 * d).sum(-1)
    det = jnp.maximum(a * c - b * b, 1e-30)
    s = b * e - c * dd
    t = b * dd - a * e
    # clamp (s, t) barycentric coords into the triangle via the standard cases
    s_in = s / det
    t_in = t / det
    # region classification, computed branch-free
    # start from the unclamped minimizer, then clamp edges
    s1 = jnp.clip(s_in, 0.0, 1.0)
    t1 = jnp.clip(t_in, 0.0, 1.0)

    # Edge clamping: evaluate candidate closest points on the 3 edges and the
    # clamped interior point, take the min — robust and branch-free (slightly
    # more FLOPs than Eberly's case analysis, ideal for SIMD/VPU).
    def _seg_sqdist(p, a_pt, b_pt):
        ab = b_pt - a_pt
        tt = ((p - a_pt) * ab).sum(-1) / jnp.maximum((ab * ab).sum(-1), 1e-30)
        tt = jnp.clip(tt, 0.0, 1.0)
        proj = a_pt + tt[..., None] * ab
        return ((p - proj) ** 2).sum(-1)

    inside = (s_in >= 0) & (t_in >= 0) & (s_in + t_in <= 1)
    proj_in = v0 + s_in[..., None] * e0 + t_in[..., None] * e1
    d_in = ((p - proj_in) ** 2).sum(-1)
    d_e0 = _seg_sqdist(p, v0, v1)
    d_e1 = _seg_sqdist(p, v0, v2)
    d_e2 = _seg_sqdist(p, v1, v2)
    d_edges = jnp.minimum(jnp.minimum(d_e0, d_e1), d_e2)
    return jnp.where(inside, jnp.minimum(d_in, d_edges), d_edges)


@functools.partial(jax.jit, static_argnames=("chunk",))
def point_surface_distance(query_points: jnp.ndarray, trg_points: jnp.ndarray,
                           trg_tris: jnp.ndarray, chunk: int = 1024) -> jnp.ndarray:
    """Unsigned distance from each query point to a triangle mesh.

    Counterpart of metrics.py:11-25 (Open3D RaycastingScene
    compute_distance). (N, 3) queries, (V, 3) vertices, (T, 3) int faces ->
    (N,) distances.
    """
    v0 = trg_points[trg_tris[:, 0]]  # (T, 3)
    v1 = trg_points[trg_tris[:, 1]]
    v2 = trg_points[trg_tris[:, 2]]

    n = query_points.shape[0]
    pad = (-n) % chunk
    q = jnp.pad(query_points, ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, 3)

    def body(carry, qc):
        d = _point_triangle_sqdist(qc[:, None, :], v0[None], v1[None], v2[None])
        return carry, jnp.sqrt(jnp.maximum(d.min(axis=1), 0.0))

    _, dists = jax.lax.scan(body, None, q)
    return dists.reshape(-1)[:n]


def assd_statistics(dist_xy: jnp.ndarray, dist_yx: jnp.ndarray):
    """Symmetric ASSD / SDSD / HD / HD95 from two directed distance vectors
    (metrics.py:28-101 `_symmetric_point_distances` semantics)."""
    mean = (dist_xy.mean() + dist_yx.mean()) / 2
    std = (dist_xy.std() + dist_yx.std()) / 2
    hd = (dist_xy.max() + dist_yx.max()) / 2
    hd95 = (jnp.quantile(dist_xy, 0.95) + jnp.quantile(dist_yx, 0.95)) / 2
    return mean, std, hd, hd95


def mesh_metrics_from_point_sets(pred_pts: jnp.ndarray, gt_pts: jnp.ndarray,
                                 pred_tris: jnp.ndarray | None = None,
                                 gt_tris: jnp.ndarray | None = None,
                                 host: bool | None = None):
    """ASSD family between a predicted and a GT surface.

    If triangles are given, uses exact point->mesh distances both ways;
    otherwise falls back to dense point-set nearest-neighbor distances
    (valid when both sets densely sample their surfaces).

    :param host: compute the point->mesh distances with the native C++ BVH
        (O(N log T), native/) instead of the device O(N*T) XLA kernel.
        Default: use native when available — evaluation runs on the host
        anyway, and the BVH spares the chip for inference work.
    """
    if pred_tris is not None and gt_tris is not None:
        if host is None:
            from . import native
            host = native.available()
        if host:
            from . import native
            import numpy as np
            d_xy = jnp.asarray(native.point_mesh_distance(
                np.asarray(gt_pts), np.asarray(gt_tris), np.asarray(pred_pts)))
            d_yx = jnp.asarray(native.point_mesh_distance(
                np.asarray(pred_pts), np.asarray(pred_tris),
                np.asarray(gt_pts)))
            return assd_statistics(d_xy, d_yx)
        d_xy = point_surface_distance(pred_pts, gt_pts, gt_tris)
        d_yx = point_surface_distance(gt_pts, pred_pts, pred_tris)
    else:
        from .ops.knn import pairwise_sqdist
        d = jnp.maximum(pairwise_sqdist(pred_pts[None], gt_pts[None])[0], 0.0)
        d_xy = jnp.sqrt(d.min(axis=1))
        d_yx = jnp.sqrt(d.min(axis=0))
    return assd_statistics(d_xy, d_yx)
