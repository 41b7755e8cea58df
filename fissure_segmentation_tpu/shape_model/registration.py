"""Point-cloud registration: thin-plate splines + coherent point drift (CPD).

Counterpart of reference shape_model/point_cloud_registration.py:
  TPS:24-66, thin_plate_dense:70-90 — TPS fitting/evaluation and dense
    displacement interpolation (direct port of the math to XLA linalg).
  register_cpd_rigid / register_cpd_deformable:103-118 — the reference wraps
    the pycpd library (not available here); CPD's EM iterations are
    implemented natively: dense Gaussian responsibilities (one matmul),
    closed-form rigid M-step (SVD), Tikhonov-regularized Gaussian-kernel
    deformable M-step (dense solve) — all device-side.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ------------------------------ TPS ------------------------------


class TPS:
    @staticmethod
    def d(a, b):
        ra = (a ** 2).sum(1)[:, None]
        rb = (b ** 2).sum(1)[None]
        dist = jnp.clip(ra + rb - 2.0 * a @ b.T, 0.0, jnp.inf)
        return jnp.sqrt(dist)

    @staticmethod
    def u(r):
        return (r ** 2) * jnp.log(r + 1e-6)

    @staticmethod
    def fit(c, f, lambd: float = 0.0):
        n = c.shape[0]
        k = TPS.u(TPS.d(c, c)) + jnp.eye(n) * lambd
        p = jnp.concatenate([jnp.ones((n, 1)), c], 1)
        a = jnp.zeros((n + 4, n + 4))
        a = a.at[:n, :n].set(k).at[:n, -4:].set(p).at[-4:, :n].set(p.T)
        v = jnp.zeros((n + 4, f.shape[1])).at[:n].set(f)
        return jnp.linalg.solve(a, v)

    @staticmethod
    def z(x, c, theta):
        u = TPS.u(TPS.d(x, c))
        w, aff = theta[:-4], theta[-4:]
        b = u @ w
        return (aff[0][None] + x[:, :1] * aff[1][None] + x[:, 1:2] * aff[2][None]
                + x[:, 2:3] * aff[3][None] + b)


def thin_plate_dense(x1, y1, shape, step: int = 4, lambd: float = 0.0):
    """Dense TPS displacement field (point_cloud_registration.py:70-90).

    :param x1: (1, N, 3) control points in [-1, 1] (xyz)
    :param y1: (1, N, 3) displacements at control points
    :param shape: (D, H, W) output field shape
    :return: (1, D, H, W, 3) dense displacement field
    """
    d, h, w = shape
    d1, h1, w1 = d // step, h // step, w // step
    # affine_grid identity with align_corners=True: linspace(-1, 1, n)
    zz, yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, d1), jnp.linspace(-1, 1, h1),
                              jnp.linspace(-1, 1, w1), indexing="ij")
    x2 = jnp.stack([xx, yy, zz], -1).reshape(-1, 3)
    theta = TPS.fit(x1[0], y1[0], lambd)
    y2 = TPS.z(x2, x1[0], theta).reshape(d1, h1, w1, 3)
    # trilinear upsample with align_corners=True (F.interpolate semantics,
    # point_cloud_registration.py:88): output i samples input
    # i*(n_in-1)/(n_out-1) — NOT jax.image.resize's half-pixel convention
    return _upsample_linear_corners(y2, (d, h, w))[None]


def _upsample_linear_corners(vol: jnp.ndarray, out_shape) -> jnp.ndarray:
    """(D1, H1, W1, C) -> (*out_shape, C) linear resize, align_corners=True.

    Separable: three 1-D interpolation passes (two gathers + a lerp each)
    instead of a dense 3-D map_coordinates, which would materialize three
    full-resolution coordinate grids (~200 MB at 256^3)."""
    for axis, n_out in enumerate(out_shape):
        n_in = vol.shape[axis]
        if n_in == n_out:
            continue
        if n_in == 1 or n_out == 1:
            idx = jnp.zeros((n_out,), jnp.int32)
            vol = jnp.take(vol, idx, axis=axis)
            continue
        pos = jnp.linspace(0.0, n_in - 1.0, n_out)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        w = (pos - lo).reshape([-1 if a == axis else 1 for a in range(vol.ndim)])
        vol = (jnp.take(vol, lo, axis=axis) * (1.0 - w)
               + jnp.take(vol, lo + 1, axis=axis) * w)
    return vol


# ------------------------------ CPD ------------------------------


def _cpd_estep(x, y_t, sigma2, w_outlier):
    """Gaussian-mixture responsibilities P (M x N) for targets x (N, 3),
    transformed sources y_t (M, 3)."""
    n, m = x.shape[0], y_t.shape[0]
    d2 = ((y_t[:, None] - x[None]) ** 2).sum(-1)
    p = jnp.exp(-d2 / (2 * sigma2))
    c = ((2 * jnp.pi * sigma2) ** 1.5) * (w_outlier / (1 - w_outlier)) * m / n
    den = p.sum(0, keepdims=True) + c
    return p / jnp.maximum(den, 1e-12)


@functools.partial(jax.jit, static_argnames=("max_iter",))
def register_cpd_rigid(x: jnp.ndarray, y: jnp.ndarray, w_outlier: float = 0.0,
                       max_iter: int = 100):
    """Rigid(+scale) CPD of source y onto target x (pycpd RigidRegistration).

    :return: (y_registered (M, 3), (scale, R (3,3), t (3,)))
    """
    n, m = x.shape[0], y.shape[0]
    sigma2_0 = ((x[None] - y[:, None]) ** 2).sum(-1).mean() / 3.0

    def body(carry, _):
        s, r, t, sigma2 = carry
        y_t = s * y @ r.T + t
        p = _cpd_estep(x, y_t, sigma2, w_outlier)
        np_ = p.sum()
        mu_x = (p.sum(0) @ x) / np_
        mu_y = (p.sum(1) @ y) / np_
        xh = x - mu_x
        yh = y - mu_y
        a = xh.T @ (p.T @ yh)  # (3, 3) = X^T P^T Y
        u, _, vt = jnp.linalg.svd(a)
        c = jnp.eye(3).at[2, 2].set(jnp.sign(jnp.linalg.det(u @ vt)))
        r_new = u @ c @ vt
        denom = (p.sum(1) * (yh ** 2).sum(1)).sum()
        s_new = jnp.trace(a.T @ r_new) / jnp.maximum(denom, 1e-12)
        t_new = mu_x - s_new * r_new @ mu_y
        trX = (p.sum(0) * (xh ** 2).sum(1)).sum()
        sigma2_new = jnp.maximum(
            (trX - s_new * jnp.trace(a.T @ r_new)) / (np_ * 3.0), 1e-8)
        return (s_new, r_new, t_new, sigma2_new), None

    init = (jnp.asarray(1.0), jnp.eye(3), jnp.zeros(3), sigma2_0)
    (s, r, t, sigma2), _ = jax.lax.scan(body, init, None, length=max_iter)
    return s * y @ r.T + t, (s, r, t)


@functools.partial(jax.jit, static_argnames=("max_iter",))
def register_cpd_deformable(x: jnp.ndarray, y: jnp.ndarray, alpha: float = 0.01,
                            beta: float = 10.0, w_outlier: float = 0.0,
                            max_iter: int = 100):
    """Deformable CPD (pycpd DeformableRegistration; reference call site
    point_cloud_registration.py:103-118 uses alpha=0.01, beta=10).

    :return: (y_registered (M, 3), displacements G @ W (M, 3))
    """
    m = y.shape[0]
    d2_yy = ((y[:, None] - y[None]) ** 2).sum(-1)
    g = jnp.exp(-d2_yy / (2 * beta ** 2))
    sigma2_0 = ((x[None] - y[:, None]) ** 2).sum(-1).mean() / 3.0

    def body(carry, _):
        w_mat, sigma2 = carry
        y_t = y + g @ w_mat
        p = _cpd_estep(x, y_t, sigma2, w_outlier)
        p1 = p.sum(1)                       # (M,)
        np_ = p1.sum()
        px = p @ x                          # (M, 3)
        a = jnp.diag(p1) @ g + alpha * sigma2 * jnp.eye(m)
        b = px - jnp.diag(p1) @ y
        w_new = jnp.linalg.solve(a, b)
        y_new = y + g @ w_new
        pt1 = p.sum(0)                      # (N,)
        xpx = (pt1 * (x ** 2).sum(1)).sum()
        ypy = (p1 * (y_new ** 2).sum(1)).sum()
        trPXY = (y_new * px).sum()
        sigma2_new = jnp.maximum((xpx - 2 * trPXY + ypy) / (np_ * 3.0), 1e-8)
        return (w_new, sigma2_new), None

    (w_mat, _), _ = jax.lax.scan(body, (jnp.zeros((m, 3)), sigma2_0), None,
                                 length=max_iter)
    disp = g @ w_mat
    return y + disp, disp
