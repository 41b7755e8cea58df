"""Volume resampling, morphology and masking.

Counterpart of reference utils/image_ops.py (SimpleITK C++ filters):
  resample_equal_spacing:12 — isotropic resampling (device-side trilinear /
                              nearest via jax.image.resize)
  multiple_objects_morphology:31 — per-label binary dilation/erosion
  apply_mask — zero out-of-mask voxels
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .filters import max_pool_same


def get_resample_factors(current_spacing, target_spacing: float = 1.0):
    return [c / target_spacing for c in current_spacing]


@functools.partial(jax.jit, static_argnames=("target_spacing", "use_nearest_neighbor",
                                             "spacing"))
def resample_equal_spacing(img: jnp.ndarray, spacing=(1.0, 1.0, 1.0),
                           target_spacing: float = 1.0,
                           use_nearest_neighbor: bool = False):
    """Resample a (D, H, W) volume with xyz `spacing` to isotropic
    `target_spacing` (image_ops.py:12-28 semantics: new size = round(size *
    spacing / target))."""
    d, h, w = img.shape
    sx, sy, sz = spacing
    new_shape = (int(round(d * sz / target_spacing)),
                 int(round(h * sy / target_spacing)),
                 int(round(w * sx / target_spacing)))
    method = "nearest" if use_nearest_neighbor else "trilinear"
    return jax.image.resize(img.astype(jnp.float32) if not use_nearest_neighbor
                            else img, new_shape, method)


def multiple_objects_morphology(labelmap: jnp.ndarray, radius: int,
                                mode: str = "dilate"):
    """Per-object binary morphology on an int labelmap
    (image_ops.py:31-48). Box structuring element of half-width `radius`."""
    n = int(jnp.max(labelmap)) + 1
    one_hot = jax.nn.one_hot(labelmap, n, axis=0)
    k = 2 * radius + 1
    if mode == "dilate":
        morphed = max_pool_same(one_hot, k) > 0.5
    elif mode == "erode":
        morphed = max_pool_same(1.0 - one_hot, k) < 0.5
    else:
        raise ValueError(f"unknown morphology mode {mode}")
    obj = jnp.argmax(morphed[1:], axis=0) + 1
    any_obj = jnp.any(morphed[1:], axis=0)
    return jnp.where(any_obj, obj, 0).astype(labelmap.dtype)


def apply_mask(img: jnp.ndarray, mask: jnp.ndarray):
    """Zero voxels outside the mask (reference utils/test_image_ops.py
    contract: in-mask values preserved, out-of-mask zero, dtype kept)."""
    return jnp.where(mask.astype(bool), img, jnp.zeros((), img.dtype))
