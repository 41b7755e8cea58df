"""Förstner interest-point detector on CT volumes.

TPU-native counterpart of reference data_processing/foerstner.py:7-108:
5-tap central-difference gradients, 6-channel structure tensor (Gaussian
smoothed), trace-of-inverse distinctiveness, max-pool NMS, mask erosion —
all dense fixed-shape XLA ops on (D, H, W) volumes.

The reference extracts keypoints with `torch.nonzero` (dynamic shape,
foerstner.py:107) and later caps them at MAX_KPTS=20000 with random
subsampling (keypoint_extraction.py:19,144-151). Here extraction is
fused and fixed-shape: a single top-k over the masked score volume returns
exactly `max_kpts` slots + a validity count — jit-stable and
differentiation-friendly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.filters import filter_1d, max_pool_same, smooth

# 5-tap central difference (foerstner.py:65)
_GRAD_FILTER = np.array([1.0, -8.0, 0.0, 8.0, -1.0], np.float32) / 12.0


def gradients(img: jnp.ndarray) -> jnp.ndarray:
    """(..., D, H, W) -> (..., 3, D, H, W) gradients along D, H, W."""
    f = jnp.asarray(_GRAD_FILTER)
    return jnp.stack([filter_1d(img, f, dim) for dim in range(3)], axis=-4)


def structure_tensor(grad: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """(..., 3, D, H, W) gradients -> (..., 6, D, H, W) smoothed structure
    tensor, channel order (xx, xy, xz, yy, yz, zz) (foerstner.py:7-15)."""
    chans = []
    for i in range(3):
        for j in range(i, 3):
            chans.append(smooth(grad[..., i, :, :, :] * grad[..., j, :, :, :], sigma))
    return jnp.stack(chans, axis=-4)


def trace_of_inverse(struct: jnp.ndarray) -> jnp.ndarray:
    """Trace of the inverse of the symmetric 3x3 tensor field
    (foerstner.py:40-59), returned as 1/D distinctiveness denominator."""
    a, b, c, e, f, i = (struct[..., k, :, :, :] for k in range(6))
    A = e * i - f * f
    E = a * i - c * c
    I = a * e - b * b
    B = -b * i + c * f
    C = b * f - c * e
    det = a * A + b * B + c * C
    return (A + E + I) / det


def distinctiveness(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Förstner distinctiveness D = 1 / tr(S^-1) (foerstner.py:62-73)."""
    grad = gradients(img)
    return 1.0 / trace_of_inverse(structure_tensor(grad, sigma))


def erode_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """6-neighborhood binary erosion (foerstner.py:90-104)."""
    m = 1.0 - mask.astype(jnp.float32)
    f = jnp.asarray([1.0, 1.0, 1.0])
    # separable trick does not apply to the cross-shaped element; do the 3
    # axis-aligned neighbor sums explicitly (6-neighborhood without center)
    s = jnp.zeros_like(m)
    for dim in range(3):
        kernel = jnp.asarray([1.0, 0.0, 1.0])
        s = s + filter_1d(m, kernel, dim, padding_mode="constant")
    return (1.0 - jnp.clip(s, 0.0, 1.0)) >= 0.5


@functools.partial(jax.jit, static_argnames=("sigma", "d", "thresh",
                                             "max_kpts", "approx_top_k"))
def foerstner_keypoints(img: jnp.ndarray, mask: jnp.ndarray, sigma: float = 1.4,
                        d: int = 9, thresh: float = 1e-8,
                        max_kpts: int = 20000,
                        rng: jax.Array | None = None,
                        approx_top_k: bool = False):
    """Detect keypoints in a (D, H, W) volume within a boolean mask.

    Parity with foerstner_kpts (foerstner.py:76-108) + the MAX_KPTS cap of
    keypoint_extraction.py. If `rng` is given and more than `max_kpts` pass,
    a *random* subset is kept (reference limit_keypoints:144-151 semantics);
    otherwise the top-distinctiveness ones are kept.

    :param approx_top_k: use `jax.lax.approx_max_k` (TPU-optimized two-stage
        selection, ~0.95 recall) instead of exact top-k over the volume.
        Semantically safe — the reference itself randomly subsamples past
        MAX_KPTS — but measured perf decides the caller's default.
    :return: (kpts (max_kpts, 3) int32 zyx voxel indices, valid (max_kpts,)
        bool, n_valid ())
    """
    dist = distinctiveness(img, sigma)
    maxfeat = max_pool_same(dist, d)
    eroded = erode_mask(mask)
    is_kpt = eroded & (maxfeat == dist) & (dist >= thresh)

    if rng is not None:
        score = jnp.where(is_kpt, jax.random.uniform(rng, dist.shape) + 1.0, -jnp.inf)
    else:
        score = jnp.where(is_kpt, dist, -jnp.inf)
    flat = score.reshape(-1)
    if approx_top_k:
        top, idx = jax.lax.approx_max_k(flat, max_kpts)
    else:
        from ..ops.topk import masked_top_k
        top, idx = masked_top_k(flat, max_kpts)
    valid = jnp.isfinite(top)
    dhw = img.shape[-3:]
    z = idx // (dhw[1] * dhw[2])
    y = (idx // dhw[2]) % dhw[1]
    x = idx % dhw[2]
    kpts = jnp.stack([z, y, x], axis=-1).astype(jnp.int32)
    return kpts, valid, is_kpt.sum()
