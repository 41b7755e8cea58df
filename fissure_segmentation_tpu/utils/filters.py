"""Separable 1-D filtering, Gaussian (derivative) kernels and NMS on volumes.

TPU-native counterpart of reference utils/image_utils.py:
  filter_1d:6   — 1-D conv along one spatial axis with replicate padding
  smooth:22     — separable Gaussian smoothing (N = ceil(1.5*sigma)*2+1 taps)
  nms:38        — max-pool non-maximum suppression (replicate padded)
  gaussian_kernel_1d:53, gaussian_differentiation:61 — scipy-style Gaussian
                  derivative kernels applied separably.

Volumes are ``(..., D, H, W)``; ``dim`` indexes the last three axes
(0 = D, 1 = H, 2 = W) exactly like the reference. All convs are
cross-correlations (both torch's conv3d and lax.conv_general_dilated are),
so kernels are bit-compatible with the reference's.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _np_gaussian_kernel1d(sigma: float, order: int, radius: int) -> np.ndarray:
    """scipy.ndimage._filters._gaussian_kernel1d, re-derived (host-side).

    Computes a Gaussian (or its `order`-th derivative) sampled on
    [-radius, radius], normalized like scipy: the order-0 kernel sums to 1 and
    derivatives are exact polynomial-in-x multiples of it. NOTE: like scipy's
    `_gaussian_kernel1d` (and the reference, image_utils.py:53-58) the kernel
    is *not* reversed for correlation — the order-1 kernel applied by
    cross-correlation computes the *negative* gradient.
    """
    if order < 0:
        raise ValueError("order must be non-negative")
    sigma2 = sigma * sigma
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi_x = np.exp(-0.5 / sigma2 * x ** 2)
    phi_x = phi_x / phi_x.sum()
    if order == 0:
        return phi_x
    # f(x) = q(x) * phi(x) with q a polynomial; q' obtained via the recurrence
    # q_{n+1}(x) = q_n'(x) - x/sigma^2 q_n(x) (scipy's exponent_range trick).
    exponent_range = np.arange(order + 1)
    q = np.zeros(order + 1)
    q[0] = 1
    D = np.diag(exponent_range[1:], 1)          # D @ q(x) = q'(x)
    P = np.diag(np.ones(order) / -sigma2, -1)   # P @ q(x) = q(x) * x / -sigma2
    Q_deriv = D + P
    for _ in range(order):
        q = Q_deriv.dot(q)
    q = (x[:, None] ** exponent_range).dot(q)
    return q * phi_x


def gaussian_kernel_1d(sigma: float, order: int = 0, truncate: float = 4.0) -> jnp.ndarray:
    """Gaussian (derivative) kernel, parity with image_utils.py:53-58."""
    sigma = float(sigma)
    radius = int(truncate * sigma + 0.5)
    return jnp.asarray(_np_gaussian_kernel1d(sigma, order, radius), dtype=jnp.float32)


def smoothing_kernel_1d(sigma: float) -> jnp.ndarray:
    """The (differently truncated) kernel used by `smooth` (image_utils.py:22-29)."""
    n = int(np.ceil(sigma * 3.0 / 2.0)) * 2 + 1
    x = np.linspace(-(n // 2), n // 2, n)
    w = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return jnp.asarray(w / w.sum(), dtype=jnp.float32)


def _replicate_pad_axis(img: jnp.ndarray, axis: int, lo: int, hi: int) -> jnp.ndarray:
    pad = [(0, 0)] * img.ndim
    pad[axis] = (lo, hi)
    return jnp.pad(img, pad, mode="edge")


def filter_1d(img: jnp.ndarray, weight: jnp.ndarray, dim: int,
              padding_mode: str = "replicate") -> jnp.ndarray:
    """1-D convolution along spatial axis `dim` of a (..., D, H, W) volume.

    Parity with reference image_utils.py:6-19 (replicate padding, symmetric
    N//2 both sides — N odd in all call sites).
    """
    weight = jnp.asarray(weight, dtype=img.dtype)
    n = weight.shape[0]
    axis = img.ndim - 3 + dim
    length = img.shape[axis]
    if padding_mode == "replicate":
        padded = _replicate_pad_axis(img, axis, n // 2, n // 2)
    elif padding_mode == "constant":
        pad = [(0, 0)] * img.ndim
        pad[axis] = (n // 2, n // 2)
        padded = jnp.pad(img, pad)
    else:
        raise ValueError(f"unsupported padding mode {padding_mode}")

    # Unrolled shifted-add: out = sum_t w[t] * x[..., t : t+L]. A 1-channel
    # lax.conv over 65k tiny rows runs ~8x slower on TPU (measured 2.5-4.3 ms
    # vs 0.31-0.35 ms per 256^3 pass) — XLA fuses the shifted reads into one
    # HBM pass, and the taps are static so the loop unrolls at trace time.
    out = None
    sl = [slice(None)] * img.ndim
    for t in range(n):
        sl[axis] = slice(t, t + length)
        term = padded[tuple(sl)] * weight[t]
        out = term if out is None else out + term
    return out


def smooth(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian smoothing, parity with image_utils.py:22-35."""
    w = smoothing_kernel_1d(sigma)
    for dim in range(3):
        img = filter_1d(img, w, dim)
    return img


def gaussian_differentiation(img: jnp.ndarray, sigma: float, order: int, dim: int,
                             padding_mode: str = "replicate",
                             truncate: float = 4.0) -> jnp.ndarray:
    """Gaussian-derivative filtering along one axis (image_utils.py:61-65)."""
    return filter_1d(img, gaussian_kernel_1d(sigma, order, truncate), dim, padding_mode)


@functools.partial(jax.jit, static_argnums=(1,))
def max_pool_same(data: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Stride-1 max-pool with replicate padding over the last 3 axes.

    Returns the local-max volume (the reference's `nms`, image_utils.py:38-50);
    callers compare `data == max_pool_same(data, k)` for NMS. Padding is
    asymmetric for even kernels: (pad2=k-1-k//2 low, pad1=k//2 high) — note
    torch F.pad order means pad2 is applied *before* each axis.
    """
    pad1 = kernel_size // 2
    pad2 = kernel_size - pad1 - 1
    # max is separable for stride-1 windows: 3 axis-wise passes are
    # 3k comparisons per voxel instead of k^3 (27 vs 729 at k=9)
    for ax in (data.ndim - 3, data.ndim - 2, data.ndim - 1):
        padded = _replicate_pad_axis(data, ax, pad2, pad1)
        window = [1] * data.ndim
        window[ax] = kernel_size
        data = jax.lax.reduce_window(
            padded, -jnp.inf, jax.lax.max,
            window_dimensions=window, window_strides=[1] * data.ndim,
            padding="VALID",
        )
    return data


nms = max_pool_same  # reference naming (image_utils.py:38)
