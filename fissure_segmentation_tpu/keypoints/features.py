"""Point feature extraction: MIND / MIND-SSC descriptors and patch features.

TPU-native counterpart of reference data_processing/point_features.py:
  mind:86              — 6-neighborhood MIND / 12-channel self-similarity-
                         context descriptors. The reference uses conv3d with
                         one-hot 3^3 shift kernels; here shifts are plain
                         padded slices (pure data movement, fused by XLA).
  compute_point_features:153 — descriptor lookup at keypoint voxels, or 5^3
                         patch sampling ('image'/'enhancement' modes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.coords import kpts_to_world
from ..utils.filters import smooth
from ..utils.sampling import sample_patches_at_kpts

# the 6-neighborhood offsets used by MIND (point_features.py:101-107)
_SIX_NH = np.array([[0, 1, 1], [1, 1, 0], [1, 0, 1],
                    [1, 1, 2], [2, 1, 1], [1, 2, 1]])
# SSC final channel permutation (point_features.py:149)
_SSC_PERM = np.array([6, 8, 1, 11, 2, 10, 0, 7, 9, 4, 5, 3])


def _ssc_pairs() -> tuple[np.ndarray, np.ndarray]:
    """The 12 (shift1, shift2) offset pairs of the self-similarity context:
    ordered pairs (i > j) of 6-NH voxels at squared distance 2
    (point_features.py:110-125)."""
    d = ((_SIX_NH[:, None] - _SIX_NH[None]) ** 2).sum(-1)
    x, y = np.meshgrid(np.arange(6), np.arange(6), indexing="ij")
    mask = (x > y) & (d == 2)
    idx1 = _SIX_NH[np.repeat(np.arange(6), 6).reshape(6, 6)[mask]]
    idx2 = _SIX_NH[np.tile(np.arange(6), 6).reshape(6, 6)[mask]]
    return idx1, idx2


def _shifted(img_pad: jnp.ndarray, off: np.ndarray, dilation: int, dhw) -> jnp.ndarray:
    """3^3-kernel one-hot conv == shifted slice of the padded volume."""
    z, y, x = (int(o) * dilation for o in off)
    d, h, w = dhw
    return img_pad[..., z:z + d, y:y + h, x:x + w]


@functools.partial(jax.jit, static_argnames=("dilation", "sigma", "ssc"))
def mind(img: jnp.ndarray, dilation: int = 1, sigma: float = 0.8,
         ssc: bool = True) -> jnp.ndarray:
    """MIND(-SSC) descriptor volume.

    :param img: (D, H, W) volume
    :return: (12, D, H, W) for ssc else (6, D, H, W)
    """
    dhw = img.shape[-3:]
    pad = [(dilation, dilation)] * 3
    img_pad = jnp.pad(img, [(0, 0)] * (img.ndim - 3) + pad, mode="edge")

    if ssc:
        idx1, idx2 = _ssc_pairs()
        diffs = [(_shifted(img_pad, o1, dilation, dhw)
                  - _shifted(img_pad, o2, dilation, dhw)) ** 2
                 for o1, o2 in zip(idx1, idx2)]
    else:
        # NOTE: the reference's plain-MIND branch (point_features.py:129-133)
        # is defective: `mshift1 = torch.ones(...)` sums the whole 27-
        # neighborhood and the advanced indexing building mshift2 sets full
        # kernel *rows* (leaving channels 3-5 all-zero). We implement the
        # *intended* 6-neighborhood MIND (center vs. shifted SSD) per
        # Heinrich et al. 2012 instead of replicating the bug.
        diffs = [(img - _shifted(img_pad, o, dilation, dhw)) ** 2
                 for o in _SIX_NH]

    m = smooth(jnp.stack(diffs, axis=0), sigma)
    m = m - jnp.min(m, axis=0, keepdims=True)
    mind_var = jnp.mean(m, axis=0, keepdims=True)
    mind_var = jnp.clip(mind_var, mind_var.mean() * 0.001, mind_var.mean() * 1000)
    m = jnp.exp(-m / mind_var)
    if ssc:
        m = m[_SSC_PERM]
    return m


def descriptor_at_keypoints(desc: jnp.ndarray, kpts_grid: jnp.ndarray) -> jnp.ndarray:
    """Look up a (C, D, H, W) descriptor volume at (N, 3) xyz grid coords by
    truncation to voxel indices (point_features.py:176-180 `.long()`)."""
    dhw = desc.shape[-3:]
    idx = kpts_to_world(kpts_grid, dhw).astype(jnp.int32)  # xyz, trunc
    idx = jnp.clip(idx, 0, jnp.asarray([dhw[2] - 1, dhw[1] - 1, dhw[0] - 1]))
    return desc[:, idx[:, 2], idx[:, 1], idx[:, 0]].T  # (N, C)


IMG_MIN = -1000.0  # reference data.py:30
IMG_MAX = 1500.0   # reference data.py:31


def normalize_img(img: jnp.ndarray, min_val: float = IMG_MIN, max_val: float = IMG_MAX):
    """HU normalization into [-1, 1] (reference data.py:365-366)."""
    return (img - min_val) / (max_val - min_val) * 2 - 1


def compute_point_features(img: jnp.ndarray, kpts_grid: jnp.ndarray,
                           feature_mode: str = "mind",
                           enhanced_img: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-keypoint feature vectors (point_features.py:153-208).

    :param img: (D, H, W) CT volume at unit spacing
    :param kpts_grid: (N, 3) xyz grid coords
    :return: (N, F) features — 6 (mind), 12 (mind_ssc) or 125 (5^3 patches)
    """
    if feature_mode in ("mind", "mind_ssc"):
        desc = mind(img, dilation=1, sigma=0.8, ssc=feature_mode == "mind_ssc")
        return descriptor_at_keypoints(desc, kpts_grid)
    if feature_mode in ("image", "enhancement"):
        src = enhanced_img if feature_mode == "enhancement" else img
        if src is None:
            raise ValueError("enhancement mode needs enhanced_img")
        patches = sample_patches_at_kpts(src, kpts_grid, patch_size=5)
        feats = patches.reshape(patches.shape[0], -1)
        if feature_mode == "image":
            feats = normalize_img(feats, max_val=0.0)
        return feats
    raise ValueError(f"no feature mode named {feature_mode}")
