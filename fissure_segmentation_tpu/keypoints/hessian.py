"""Hessian-based fissure enhancement (Wiemker et al. plateness filter).

TPU-native counterpart of reference
data_processing/fissure_enhancement.py:30-198: separable Gaussian-derivative
Hessian, eigenvalues sorted by |λ| descending, plateness
P = (|λ1|-|λ2|)/(|λ1|+|λ2|) where λ1 < 0, multiplied by a Gaussian
Hounsfield-unit weighting around the fissure intensity statistics.

Instead of `torch.linalg.eigvalsh` (unsupported / slow on TPU) the symmetric
3x3 eigenvalues are computed in closed form (trigonometric method) — pure
VPU element-wise math over the volume, fully fused by XLA.

Note: the reference's HessianEnhancementFilter.forward computes a smoothed
image but then builds the Hessian from the *raw* image
(fissure_enhancement.py:50-57) — we reproduce that behavior.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.filters import filter_1d, gaussian_kernel_1d


def hessian_components(img: jnp.ndarray, sigma: float = 1.0) -> tuple:
    """Six unique Hessian components of a (..., D, H, W) volume via separable
    Gaussian derivative filters (fissure_enhancement.py:82-101).

    Returns (h00, h11, h22, h01, h02, h12) with dims ordered (D, H, W).
    """
    k1 = gaussian_kernel_1d(sigma, order=1)
    k2 = gaussian_kernel_1d(sigma, order=2)
    h_diag = [filter_1d(img, k2, dim) for dim in range(3)]
    h01 = filter_1d(filter_1d(img, k1, 0), k1, 1)
    h02 = filter_1d(filter_1d(img, k1, 0), k1, 2)
    h12 = filter_1d(filter_1d(img, k1, 1), k1, 2)
    return h_diag[0], h_diag[1], h_diag[2], h01, h02, h12


def eigvalsh3(a00, a11, a22, a01, a02, a12):
    """Closed-form eigenvalues of a field of symmetric 3x3 matrices.

    Trigonometric method (Smith 1961); returns (e1, e2, e3) unsorted
    (e1 >= e2 >= e3 actually, by construction of the cosine angles).
    """
    p1 = a01 ** 2 + a02 ** 2 + a12 ** 2
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    inv_p = 1.0 / p
    b00, b11, b22 = (a00 - q) * inv_p, (a11 - q) * inv_p, (a22 - q) * inv_p
    b01, b02, b12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
    # det(B) / 2
    r = (b00 * (b11 * b22 - b12 * b12)
         - b01 * (b01 * b22 - b12 * b02)
         + b02 * (b01 * b12 - b11 * b02)) / 2.0
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    # degenerate (diagonal/isotropic) case
    is_degenerate = p2 <= 1e-30
    e1 = jnp.where(is_degenerate, q, e1)
    e2 = jnp.where(is_degenerate, q, e2)
    e3 = jnp.where(is_degenerate, q, e3)
    return e1, e2, e3


def _top2_by_abs(e1, e2, e3):
    """The two eigenvalues with largest |.| (descending).

    Pure element-wise compare-swaps on the three separate volumes. Never
    stack to a trailing axis of 3 here: that layout tiles to (…, 128) lanes
    on TPU and the argmax/take_along_axis variant measured 768 ms per 256^3
    volume vs 0.07 ms for this formulation (11000x).
    """
    a1, a2, a3 = jnp.abs(e1), jnp.abs(e2), jnp.abs(e3)

    def swap(v1, va, v2, vb):
        c = va >= vb
        return (jnp.where(c, v1, v2), jnp.where(c, va, vb),
                jnp.where(c, v2, v1), jnp.where(c, vb, va))

    e1, a1, e2, a2 = swap(e1, a1, e2, a2)
    e1, a1, e3, a3 = swap(e1, a1, e3, a3)
    e2, a2, e3, a3 = swap(e2, a2, e3, a3)
    return e1, e2


def fissure_filter(img: jnp.ndarray, lambda1: jnp.ndarray, lambda2: jnp.ndarray,
                   fissure_mu: float, fissure_sigma: float) -> jnp.ndarray:
    """Plateness x HU-weighting (fissure_enhancement.py:149-180)."""
    abs1, abs2 = jnp.abs(lambda1), jnp.abs(lambda2)
    p = jnp.where(lambda1 < 0, (abs1 - abs2) / jnp.maximum(abs1 + abs2, 1e-30), 0.0)
    hu_w = jnp.exp(-((img - fissure_mu) ** 2) / (2 * fissure_sigma ** 2))
    return hu_w * p


@functools.partial(jax.jit, static_argnames=("gaussian_derivation_sigma",))
def hessian_fissure_enhancement(img: jnp.ndarray, fissure_mu: float,
                                fissure_sigma: float,
                                gaussian_derivation_sigma: float = 1.0) -> jnp.ndarray:
    """Fissure-enhanced volume, parity with
    HessianEnhancementFilter.forward (fissure_enhancement.py:47-80), dense
    (no patch tiling needed on TPU — the whole volume fits HBM).

    :param img: (D, H, W) CT volume (Hounsfield units)
    """
    h = hessian_components(img, gaussian_derivation_sigma)
    e1, e2, e3 = eigvalsh3(*h)
    l1, l2 = _top2_by_abs(e1, e2, e3)
    return fissure_filter(img, l1, l2, fissure_mu, fissure_sigma)
