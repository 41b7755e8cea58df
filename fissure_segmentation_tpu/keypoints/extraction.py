"""Keypoint extraction dispatcher: 4 modes -> point-cloud case dicts.

TPU-native counterpart of reference
data_processing/keypoint_extraction.py:19-234 (`compute_keypoints`,
`save_keypoints`, MAX_KPTS=20000 cap with random subsampling):

  foerstner    — Förstner detector (sigma=0.5, thresh=1e-8, nms d=5)
  noisy        — GT fissure voxels + N(0, 3) jitter (testing mode)
  cnn          — pre-seg CNN softmax: argmax != 0 within the lung mask,
                 plus 5^3 softmax-score patches as features
  enhancement  — Hessian plateness image, Gaussian var-1 smoothed, top
                 MAX_KPTS voxels above 0.2

All modes produce a fixed-cap point set (max_kpts slots + validity) on
device; labels are looked up in the (pre-dilated) fissure labelmap and
coordinates converted to [-1, 1] grid coords.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.coords import kpts_to_grid
from ..utils.filters import smooth
from ..utils.sampling import sample_patches_at_kpts
from .foerstner import foerstner_keypoints
from ..ops.topk import masked_top_k
from .hessian import hessian_fissure_enhancement

MAX_KPTS = 20000


def _random_cap(rng, kp: jnp.ndarray, valid: jnp.ndarray, max_kpts: int):
    """Random subset of the valid keypoints, fixed output size
    (keypoint_extraction.py:144-151 semantics)."""
    n = kp.shape[0]
    if n <= max_kpts:
        return kp, valid
    score = jnp.where(valid, jax.random.uniform(rng, (n,)), -jnp.inf)
    top, idx = masked_top_k(score, max_kpts)
    # validity from the selected scores, not valid[idx]: -inf slots may
    # carry clamped indices that land on a valid row
    return kp[idx], valid[idx] & jnp.isfinite(top)


def get_noisy_keypoints(rng: jax.Array, fissures: jnp.ndarray,
                        max_kpts: int = MAX_KPTS):
    """GT fissure voxels + N(0,3) noise (keypoint_extraction.py:33-50),
    fixed-shape: scores = random where fissure, top-k."""
    flat = (fissures != 0).reshape(-1)
    r1, r2 = jax.random.split(rng)
    score = jnp.where(flat, jax.random.uniform(r1, flat.shape), -jnp.inf)
    top, idx = masked_top_k(score, max_kpts)
    valid = jnp.isfinite(top)
    d, h, w = fissures.shape
    kp = jnp.stack([idx // (h * w), (idx // w) % h, idx % w], -1).astype(jnp.float32)
    kp = kp + jax.random.normal(r2, kp.shape) * 3.0
    kp = jnp.clip(jnp.round(kp).astype(jnp.int32), 0,
                  jnp.asarray([d - 1, h - 1, w - 1]))
    return kp, valid


def get_enhancement_keypoints(enhanced: jnp.ndarray, min_threshold: float = 0.2,
                              max_kpts: int = MAX_KPTS):
    """Top-k of the smoothed enhancement image above threshold
    (keypoint_extraction.py:134-141; DiscreteGaussian var 1 == sigma 1)."""
    sm = smooth(enhanced, 1.0)
    # Threshold BEFORE the top-k (reference thresholds after,
    # keypoint_extraction.py:138-140 — same selected set either way): the
    # plateness image is exactly 0.0 wherever lambda1 >= 0, and those mass
    # ties at the cut defeat masked_top_k's exactness certificate, forcing
    # its slow lax.top_k fallback every call (measured 64 -> 22 ms/case).
    score = jnp.where(sm > min_threshold, sm, -jnp.inf).reshape(-1)
    top, idx = masked_top_k(score, max_kpts)
    valid = jnp.isfinite(top)
    d, h, w = enhanced.shape
    kp = jnp.stack([idx // (h * w), (idx // w) % h, idx % w], -1).astype(jnp.int32)
    return kp, valid


def get_cnn_keypoints(softmax_scores: jnp.ndarray, lung_mask: jnp.ndarray,
                      feat_patch: int = 5, max_kpts: int = MAX_KPTS,
                      rng: jax.Array | None = None,
                      want_features: bool = True,
                      approx_top_k: bool = False):
    """Keypoints = foreground argmax within the lung mask; features = 5^3
    patches of all softmax channels (keypoint_extraction.py:53-131).

    :param softmax_scores: (D, H, W, C) from models.seg_cnn.predict_all_patches
    :param want_features: skip the softmax-patch feature sampling (serving
        with a coords-only point model never reads them; the 4x trilinear
        patch gather is the most expensive part of this extraction)
    :param approx_top_k: select the random foreground subset with the
        TPU-optimized `jax.lax.approx_max_k` instead of the exact masked
        top-k. When foreground count > max_kpts (the practical serving
        regime — fissure foreground at 256^3 is ~100k+ voxels), the scores
        are uniform RANDOM numbers and the reference itself keeps a
        uniformly random subset past MAX_KPTS
        (keypoint_extraction.py:144-151), so the approximate top-k is just a
        different uniformly random subset: same distribution, ~9 ms cheaper
        on the 16.7M-voxel volume. Caveat: when foreground is SMALLER than
        max_kpts, the bucketed reduction may drop up to ~5% of foreground
        voxels that the exact path would keep.
    :return: (kp (max_kpts, 3) zyx, valid, features (max_kpts, C*p^3) or None)
    """
    pred = jnp.argmax(softmax_scores, -1)
    fg = (pred != 0) & lung_mask
    flat = fg.reshape(-1)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    score = jnp.where(flat, jax.random.uniform(rng, flat.shape), -jnp.inf)
    if approx_top_k:
        top, idx = jax.lax.approx_max_k(score, max_kpts)
    else:
        top, idx = masked_top_k(score, max_kpts)
    valid = jnp.isfinite(top)
    d, h, w, c = softmax_scores.shape
    kp = jnp.stack([idx // (h * w), (idx // w) % h, idx % w], -1).astype(jnp.int32)

    if not want_features:
        return kp, valid, None
    grid = kpts_to_grid(kp[:, ::-1].astype(jnp.float32), (d, h, w))
    feats = []
    for ch in range(c):
        patches = sample_patches_at_kpts(softmax_scores[..., ch], grid, feat_patch)
        feats.append(patches.reshape(max_kpts, -1))
    return kp, valid, jnp.concatenate(feats, -1)


def compute_keypoints(rng: jax.Array, img: np.ndarray | None,
                      fissures: np.ndarray, mask: np.ndarray,
                      kp_mode: str = "foerstner",
                      enhanced_img: np.ndarray | None = None,
                      cnn_softmax: np.ndarray | None = None,
                      lobes: np.ndarray | None = None,
                      case_id: str = "case", sequence: str = "fixed",
                      max_kpts: int = MAX_KPTS, dilate_labels: int = 2,
                      feature_mode: str | None = None) -> dict:
    """Full keypoint pipeline for one (unit-spacing) case -> case dict
    (keypoint_extraction.py:154-234). Inputs are (D, H, W) arrays.

    :param feature_mode: optional per-point features to attach
        (point_features.py:153-208): 'mind' / 'mind_ssc' / 'image' /
        'enhancement'. Overrides the cnn mode's softmax-patch features.
        The chosen kp/feature combination is recorded in the case dict so
        training can validate it against the requested flags.
    """
    shape = fissures.shape
    fiss = jnp.asarray(np.asarray(fissures).astype(np.int32))
    if dilate_labels > 0:
        # per-object dilation (multiple_objects_morphology, radius=2)
        from ..utils.filters import max_pool_same
        one_hot = jax.nn.one_hot(fiss, int(fiss.max()) + 1, axis=0)
        dil = max_pool_same(one_hot, 2 * dilate_labels + 1)
        # background only where no object was dilated in
        obj = jnp.argmax(dil[1:], axis=0) + 1
        any_obj = jnp.max(dil[1:], axis=0) > 0.5
        fiss = jnp.where(any_obj, obj, 0).astype(jnp.int32)

    feats = None
    if kp_mode == "foerstner":
        kp, valid, _ = foerstner_keypoints(jnp.asarray(img), jnp.asarray(mask),
                                           sigma=0.5, d=5, thresh=1e-8,
                                           max_kpts=max_kpts, rng=rng)
    elif kp_mode == "noisy":
        kp, valid = get_noisy_keypoints(rng, fiss, max_kpts)
    elif kp_mode == "enhancement":
        if enhanced_img is None:
            if img is None:
                raise ValueError("enhancement mode needs an image")
            enhanced_img = hessian_fissure_enhancement(
                jnp.asarray(img), fissure_mu=-313.5, fissure_sigma=62.6)
        kp, valid = get_enhancement_keypoints(jnp.asarray(enhanced_img),
                                              max_kpts=max_kpts)
    elif kp_mode == "cnn":
        if cnn_softmax is None:
            raise ValueError("cnn mode needs precomputed softmax scores")
        kp, valid, feats = get_cnn_keypoints(jnp.asarray(cnn_softmax),
                                             jnp.asarray(mask), rng=rng,
                                             max_kpts=max_kpts)
    else:
        raise ValueError(f'No keypoint-mode named "{kp_mode}".')

    kp = np.asarray(kp)
    valid = np.asarray(valid)
    kp, feats = kp[valid], (None if feats is None else np.asarray(feats)[valid])
    if len(kp) < 2048:
        print(f"{case_id} {sequence} has less than minimum of 2048 kpts!")

    labels = np.asarray(fiss)[kp[:, 0], kp[:, 1], kp[:, 2]]
    coords = np.asarray(kpts_to_grid(kp[:, ::-1].astype(np.float32), shape))

    if feature_mode is not None:
        from .features import compute_point_features
        if img is None:
            raise ValueError(f"feature mode '{feature_mode}' needs an image")
        enh = enhanced_img
        if feature_mode == "enhancement" and enh is None:
            enh = hessian_fissure_enhancement(
                jnp.asarray(img), fissure_mu=-313.5, fissure_sigma=62.6)
        feats = np.asarray(compute_point_features(
            jnp.asarray(img), jnp.asarray(coords), feature_mode,
            enhanced_img=None if enh is None else jnp.asarray(enh)))

    case = {"coords": coords, "labels": labels.astype(np.int32),
            "shape": tuple(shape), "spacing": (1.0, 1.0, 1.0),
            "case_id": case_id, "sequence": sequence,
            "kp_mode": kp_mode,
            "feature_mode": feature_mode or
            ("cnn" if kp_mode == "cnn" else None)}
    if lobes is not None:
        case["lobes"] = np.asarray(lobes)[kp[:, 0], kp[:, 1], kp[:, 2]].astype(np.int32)
    if feats is not None:
        case["features"] = feats.astype(np.float32)
    return case
