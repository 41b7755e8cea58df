"""Point-cloud normal estimation (kNN-PCA) with orientation.

Replaces the reference's host-side Open3D `estimate_normals` +
`orient_normals_consistent_tangent_plane` (surface_fitting.py:62-66) and
pytorch3d's `estimate_pointcloud_normals` (dpsr_net.py:173): the covariance
of each point's k-neighborhood is built with one batched matmul, its
smallest eigenvector is computed in closed form (no iterative eigensolver),
and normals are oriented against a global reference direction — fissures are
near-height-field surfaces, so the dominant-plane normal of the whole cloud
is a consistent orientation reference (Open3D's MST propagation is a
sequential algorithm that maps poorly to TPUs; tracked as a possible
refinement for pathological geometries).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..keypoints.hessian import eigvalsh3
from .knn import knn


def _smallest_eigvec3(a00, a11, a22, a01, a02, a12):
    """Unit eigenvector of the smallest eigenvalue of symmetric 3x3 fields.

    Rows of (A - lambda I) span the orthogonal complement of the eigenvector;
    the cross product of the two most independent rows recovers it.
    """
    e1, e2, e3 = eigvalsh3(a00, a11, a22, a01, a02, a12)
    lam = jnp.minimum(jnp.minimum(e1, e2), e3)
    r0 = jnp.stack([a00 - lam, a01, a02], -1)
    r1 = jnp.stack([a01, a11 - lam, a12], -1)
    r2 = jnp.stack([a02, a12, a22 - lam], -1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 ** 2, -1)
    n02 = jnp.sum(c02 ** 2, -1)
    n12 = jnp.sum(c12 ** 2, -1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], -1), axis=-1)
    v = jnp.take_along_axis(jnp.stack([c01, c02, c12], -2),
                            best[..., None, None], axis=-2)[..., 0, :]
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # degenerate (isotropic) neighborhoods: fall back to +z
    fallback = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), v.shape)
    return jnp.where(norm > 1e-12, v / jnp.maximum(norm, 1e-12), fallback)


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_pointcloud_normals(points: jnp.ndarray, k: int = 30,
                                mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-point unit normals from k-neighborhood PCA.

    :param points: (B, N, 3) or (N, 3)
    :param mask: optional (B, N) validity — invalid points are excluded from
        every neighborhood (their own normals are arbitrary).
    :return: normals of the same shape, globally oriented (dominant-plane
        reference + sign fixed toward +z-ish half space for determinism)
    """
    if points.ndim == 2:
        out = estimate_pointcloud_normals(points[None], k,
                                          None if mask is None else mask[None])
        return out[0]

    pts = points
    if mask is not None:
        # push invalid points far away so they never enter neighborhoods
        far = jnp.where(mask[..., None], pts, 1e6)
    else:
        far = pts
    idx = knn(far, k, self_loop=True)
    neigh = jnp.take_along_axis(pts[..., None, :], idx[..., None], axis=-3)
    mean = neigh.mean(axis=-2, keepdims=True)
    d = neigh - mean
    cov = jnp.einsum("...ki,...kj->...ij", d, d,
                     precision=jax.lax.Precision.HIGHEST) / k
    n = _smallest_eigvec3(cov[..., 0, 0], cov[..., 1, 1], cov[..., 2, 2],
                          cov[..., 0, 1], cov[..., 0, 2], cov[..., 1, 2])

    # global orientation: reference = smallest PCA axis of the full cloud
    if mask is not None:
        w = mask[..., None].astype(pts.dtype)
        mu = (pts * w).sum(-2, keepdims=True) / jnp.maximum(w.sum(-2, keepdims=True), 1)
        dc = (pts - mu) * w
    else:
        mu = pts.mean(-2, keepdims=True)
        dc = pts - mu
    gcov = jnp.einsum("...ni,...nj->...ij", dc, dc,
                      precision=jax.lax.Precision.HIGHEST)
    ref = _smallest_eigvec3(gcov[..., 0, 0], gcov[..., 1, 1], gcov[..., 2, 2],
                            gcov[..., 0, 1], gcov[..., 0, 2], gcov[..., 1, 2])
    # deterministic sign for the reference itself
    ref = ref * jnp.where(ref[..., 2:3] + 1e-12 * ref[..., 0:1] >= 0, 1.0, -1.0)
    flip = jnp.sum(n * ref[..., None, :], axis=-1, keepdims=True) < 0
    return jnp.where(flip, -n, n)
