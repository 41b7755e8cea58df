"""Volume sampling at normalized grid coordinates (grid_sample equivalent).

Implements torch.nn.functional.grid_sample semantics for 3-D volumes —
xyz coords in [-1, 1], align_corners=False, border padding, 'nearest' or
trilinear 'bilinear' interpolation — as explicit XLA gathers (device-side,
differentiable). Used for keypoint patch features
(utils/general_utils.py:260-296 `sample_patches_at_kpts`) and resampling.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .coords import kpts_to_world


def _gather_zyx(vol: jnp.ndarray, z, y, x):
    """vol (..., D, H, W); z/y/x integer arrays of identical shape."""
    return vol[..., z, y, x]


@functools.partial(jax.jit, static_argnames=("mode", "padding_mode"))
def grid_sample_volume(vol: jnp.ndarray, coords: jnp.ndarray,
                       mode: str = "bilinear", padding_mode: str = "border"):
    """Sample a (D, H, W) or (C, D, H, W) volume at (..., 3) xyz grid coords.

    :return: (..., ) samples (or (C, ...) for multichannel input)
    """
    dhw = vol.shape[-3:]
    idx = kpts_to_world(coords, dhw)[..., ::-1]  # zyx float indices
    maxi = jnp.asarray([s - 1 for s in dhw], jnp.float32)

    if padding_mode == "border":
        idx = jnp.clip(idx, 0.0, maxi)
    elif padding_mode != "zeros":
        raise ValueError(padding_mode)

    if mode == "nearest":
        # torch rounds half away from the sample? grid_sample nearest uses
        # round-half-even on the *unnormalized* coordinate; floor(x+0.5)
        # matches its behavior for the generic case.
        near = jnp.floor(idx + 0.5).astype(jnp.int32)
        near = jnp.clip(near, 0, jnp.asarray([s - 1 for s in dhw]))
        out = _gather_zyx(vol, near[..., 0], near[..., 1], near[..., 2])
        if padding_mode == "zeros":
            inside = jnp.all((idx >= -0.5) & (idx <= maxi + 0.5), axis=-1)
            out = jnp.where(inside, out, 0.0)
        return out

    if mode != "bilinear":
        raise ValueError(mode)

    lo_f = jnp.floor(idx)
    lo = lo_f.astype(jnp.int32)
    frac = idx - lo_f
    max_int = jnp.asarray([s - 1 for s in dhw])

    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                corner = lo + jnp.asarray([dz, dy, dx])
                w = ((frac[..., 0] if dz else 1 - frac[..., 0])
                     * (frac[..., 1] if dy else 1 - frac[..., 1])
                     * (frac[..., 2] if dx else 1 - frac[..., 2]))
                if padding_mode == "zeros":
                    # torch semantics: each out-of-range corner contributes 0
                    in_rng = jnp.all((corner >= 0) & (corner <= max_int), axis=-1)
                    w = jnp.where(in_rng, w, 0.0)
                corner = jnp.clip(corner, 0, max_int)
                out = out + w * _gather_zyx(vol, corner[..., 0], corner[..., 1],
                                            corner[..., 2])
    return out


def patch_grid_offsets(patch_size: int, vol_shape) -> jnp.ndarray:
    """The reference's identity affine_grid for a patch (align_corners=False),
    scaled into volume-relative grid units (general_utils.py:271-277).

    :return: (patch_size^3, 3) xyz offsets in grid coords
    """
    p = patch_size
    base = (2.0 * jnp.arange(p) + 1.0) / p - 1.0  # torch affine_grid, ac=False
    zz, yy, xx = jnp.meshgrid(base, base, base, indexing="ij")
    grid = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)  # xyz order
    d, h, w = vol_shape[-3:]
    scale = p / jnp.asarray([w, h, d], jnp.float32)
    return grid * scale


@functools.partial(jax.jit, static_argnames=("patch_size",))
def sample_patches_at_kpts(vol: jnp.ndarray, kpts_grid: jnp.ndarray,
                           patch_size: int) -> jnp.ndarray:
    """Sample a patch_size^3 patch around each keypoint
    (general_utils.py:260-296; nearest for odd sizes, trilinear for even).

    :param vol: (D, H, W) volume
    :param kpts_grid: (N, 3) xyz grid coords in [-1, 1]
    :return: (N, patch_size, patch_size, patch_size)
    """
    offs = patch_grid_offsets(patch_size, vol.shape)  # (p^3, 3)
    coords = kpts_grid[:, None, :] + offs[None]       # (N, p^3, 3)
    mode = "nearest" if patch_size % 2 == 1 else "bilinear"
    out = grid_sample_volume(vol, coords, mode=mode, padding_mode="border")
    p = patch_size
    return out.reshape(-1, p, p, p)
