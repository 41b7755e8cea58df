"""Plane-based fissure regularization (legacy 'plane' mode).

Counterpart of reference data_processing/surface_fitting_optimization.py:
  `Plane` (:24-67) — a parametric plane (unit normal n, offset d) whose
      z-displacement field is optimized to the fissure point cloud;
  `fit_plane_to_fissure` — Adam-fitted plane per fissure label, used as the
      alternative regularizer in surface_fitting.py:190-192.

TPU-native: closed-form least-squares initialization (SVD) + optax Adam
refinement with a robust (Huber) point-to-plane loss, all jitted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax


def plane_from_points_lstsq(pts: jnp.ndarray, valid: jnp.ndarray | None = None):
    """Closed-form total-least-squares plane: (unit normal (3,), offset d)
    with n . p = d; the smallest-singular-vector of the centered cloud."""
    if valid is None:
        valid = jnp.ones(pts.shape[0], bool)
    w = valid.astype(pts.dtype)[:, None]
    center = (pts * w).sum(0) / jnp.maximum(w.sum(), 1e-9)
    centered = (pts - center) * w
    _, _, vt = jnp.linalg.svd(centered, full_matrices=False)
    n = vt[-1]
    return n, jnp.dot(n, center)


def fit_plane_to_fissure(pts: jnp.ndarray, valid: jnp.ndarray | None = None,
                         steps: int = 200, lr: float = 1e-2,
                         huber_delta: float = 1.0):
    """Robust plane fit (surface_fitting_optimization.fit_plane_to_fissure):
    least-squares init, then Adam on the Huber point-to-plane distance.

    :param pts: (N, 3) fissure points (any consistent coordinate frame)
    :return: (unit normal (3,), offset d)
    """
    if valid is None:
        valid = jnp.ones(pts.shape[0], bool)
    n0, d0 = plane_from_points_lstsq(pts, valid)
    params = {"n": n0, "d": d0}
    tx = optax.adam(lr)

    def loss_fn(p):
        n = p["n"] / jnp.maximum(jnp.linalg.norm(p["n"]), 1e-9)
        dist = pts @ n - p["d"]
        h = optax.huber_loss(dist, delta=huber_delta)
        w = valid.astype(pts.dtype)
        return (h * w).sum() / jnp.maximum(w.sum(), 1e-9)

    @jax.jit
    def fit(params):
        opt_state = tx.init(params)

        def body(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(body, (params, opt_state),
                                           None, length=steps)
        return params, losses

    params, losses = fit(params)
    n = params["n"] / jnp.maximum(jnp.linalg.norm(params["n"]), 1e-9)
    return n, params["d"]


def plane_to_mesh(normal, offset, shape, mask: np.ndarray | None = None,
                  grid_n: int = 48):
    """Rasterize the fitted plane into a triangle soup inside the volume
    (optionally clipped to a mask) — the mesh output used by
    surface_fitting.py:190-192's 'plane' mode.

    :param shape: (D, H, W) volume shape; plane coords are world xyz voxels
    :return: (tris (T, 3, 3) world xyz, valid (T,))
    """
    normal = np.asarray(normal)
    offset = float(offset)
    d, h, w = shape
    # parameterize over the two axes least aligned with the normal
    drop = int(np.argmax(np.abs(normal)))
    axes = [a for a in range(3) if a != drop]
    extent = [w, h, d]
    u = np.linspace(0, extent[axes[0]] - 1, grid_n)
    v = np.linspace(0, extent[axes[1]] - 1, grid_n)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    verts = np.zeros((grid_n, grid_n, 3), np.float32)
    verts[..., axes[0]] = uu
    verts[..., axes[1]] = vv
    verts[..., drop] = (offset - normal[axes[0]] * uu
                        - normal[axes[1]] * vv) / normal[drop]

    inside = (verts[..., drop] >= 0) & (verts[..., drop] <= extent[drop] - 1)
    if mask is not None:
        idx = np.clip(np.round(verts[..., ::-1]).astype(int), 0,
                      np.asarray(shape) - 1)  # xyz -> zyx
        inside &= mask[idx[..., 0], idx[..., 1], idx[..., 2]]

    tris, valid = [], []
    for i in range(grid_n - 1):
        for j in range(grid_n - 1):
            q = verts[i:i + 2, j:j + 2].reshape(4, 3)
            ok = inside[i:i + 2, j:j + 2].all()
            tris.extend([[q[0], q[1], q[2]], [q[1], q[3], q[2]]])
            valid.extend([ok, ok])
    return np.asarray(tris, np.float32), np.asarray(valid, bool)
