"""Dense deformable image registration by Adam instance optimization.

TPU-native re-design of the reference's VoxelMorph++/ConvexAdam-style
registration (shape_model/adam_registration.py:64-175): MIND-SSC + one-hot
label features at half resolution, a dense low-resolution displacement field
optimized by Adam with diffusion regularization and triple 3x3x3 box-filter
(B-spline-like) smoothing, then trilinear upsampling + smoothing to full
resolution.  Used to register lung CT pairs (e.g. DIRlab COPD inhale/exhale)
and to propagate fissure labels / evaluate landmark TRE.

TPU-first differences from the reference:
  * the whole optimization is ONE jitted `lax.scan` over Adam steps (the
    reference runs a Python loop of 50 separate autograd graphs);
  * the displacement parameter is initialized at zero (or an explicit warm
    start).  The reference initializes the parameter with the *normalized
    identity grid* (adam_registration.py:104-106), a ConvexAdam port
    artifact that injects a spurious ~1-low-res-voxel outward ramp through
    `grid0/scale`; we do not replicate it;
  * coordinate conversion uses exact align_corners=False semantics
    (delta_norm = delta_vox * 2 / size) throughout (utils/coords.py),
    where the reference mixes (size-1)/2 and size/2 conventions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..keypoints.features import mind
from ..utils.sampling import grid_sample_volume

GRID_SP = 2  # low-res optimization grid spacing (adam_registration.py:13)


def _box_smooth3(disp: jnp.ndarray, passes: int = 3) -> jnp.ndarray:
    """`passes` consecutive 3x3x3 mean filters over the spatial dims of a
    (d, h, w, 3) field — torch `avg_pool3d(k=3, stride=1, padding=1)` with
    count_include_pad=True parity (adam_registration.py:112-114)."""
    for _ in range(passes):
        disp = jax.lax.reduce_window(
            disp, 0.0, jax.lax.add, (3, 3, 3, 1), (1, 1, 1, 1),
            [(1, 1), (1, 1), (1, 1), (0, 0)]) / 27.0
    return disp


def _identity_grid_xyz(dhw) -> jnp.ndarray:
    """(d, h, w, 3) xyz normalized [-1,1] coords, align_corners=False."""
    d, h, w = dhw
    zz, yy, xx = jnp.meshgrid(jnp.arange(d), jnp.arange(h), jnp.arange(w),
                              indexing="ij")
    size_zyx = jnp.asarray([d, h, w], jnp.float32)
    norm = (jnp.stack([zz, yy, xx], -1) + 0.5) * 2.0 / size_zyx - 1.0
    return norm[..., ::-1].astype(jnp.float32)  # zyx -> xyz


def downsample_mean(vol: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Average-pool the trailing 3 dims by `factor` (stride = kernel)."""
    lead = vol.ndim - 3
    win = (1,) * lead + (factor,) * 3
    return jax.lax.reduce_window(vol, 0.0, jax.lax.add, win, win,
                                 "VALID") / factor ** 3


def registration_features(img_hu: jnp.ndarray, lung_mask=None, fissures=None,
                          lobes=None, n_labels: int = 16,
                          grid_sp: int = GRID_SP) -> jnp.ndarray:
    """Assemble the (C, d, h, w) feature volume the cost is computed on:
    masked MIND-SSC (12 ch, mean-pooled) + one-hot combined lobes/fissures
    labels (nearest-downsampled), as in adam_registration.py:41-47,83-92.
    Odd volume dims are floor-cropped to a multiple of `grid_sp` so both
    feature groups downsample to identical shapes.

    :param img_hu: (D, H, W) CT in Hounsfield units
    :param n_labels: static one-hot width for the combined label volume.
        `combined = lobes + fissures + max(lobes)` reaches 5+3+5 = 13 for
        the 5-lobe/3-fissure convention; the default 16 keeps headroom
        (jax.nn.one_hot silently zeroes out-of-range indices, which would
        drop exactly the fissure-voxel features the cost needs).
    """
    m = mind(img_hu, ssc=True)                       # (12, D, H, W)
    if lung_mask is not None:
        m = m * lung_mask[None].astype(m.dtype)
    feats = [downsample_mean(m, grid_sp)]
    if lobes is not None or fissures is not None:
        lob = jnp.zeros_like(img_hu, jnp.int32) if lobes is None \
            else lobes.astype(jnp.int32)
        if fissures is not None:
            fis = fissures.astype(jnp.int32)
            combined = lob + jnp.where(fis != 0, fis + lob.max(), 0)
        else:
            combined = lob
        onehot = jax.nn.one_hot(combined, n_labels, axis=0)  # (L, D, H, W)
        # floor-crop so the strided nearest-downsample matches the VALID
        # (floor) mean-pool of the MIND branch on odd dims
        dm, hm, wm = (s // grid_sp for s in onehot.shape[1:])
        feats.append(onehot[:, :dm * grid_sp:grid_sp, :hm * grid_sp:grid_sp,
                            :wm * grid_sp:grid_sp])
    return jnp.concatenate(feats, axis=0).astype(jnp.float32)


def _loss_fn(disp, feat_fix, feat_mov, id_xyz, lambda_weight):
    disp_s = _box_smooth3(disp)
    # NB units: disp is in low-res *voxels*, and lambda_weight=0.65 is the
    # reference/ConvexAdam production value for voxel-unit fields (its
    # reg_loss also penalizes the voxel-unit weight, only the sampling grid
    # divides by `scale`) — do not "fix" this by switching the penalty to
    # normalized units, that would weaken it by (size_lo/2)^2.
    reg = sum(jnp.mean(jnp.square(jnp.diff(disp_s, axis=a)))
              for a in range(3)) * lambda_weight
    size_zyx = jnp.asarray(disp.shape[:3], jnp.float32)
    delta_xyz = (disp_s * 2.0 / size_zyx)[..., ::-1]
    sampled = grid_sample_volume(feat_mov, id_xyz + delta_xyz,
                                 mode="bilinear", padding_mode="zeros")
    cost = jnp.mean(jnp.square(sampled - feat_fix), axis=0) * 12.0
    return jnp.mean(cost) + reg


@functools.partial(jax.jit, static_argnames=("iters",))
def dense_adam_registration(feat_fix: jnp.ndarray, feat_mov: jnp.ndarray,
                            iters: int = 50, lambda_weight: float = 0.65,
                            lr: float = 1.0, init_disp=None):
    """Optimize a (d, h, w, 3) zyx low-res-voxel displacement field so that
    `feat_mov` sampled at (identity + disp) matches `feat_fix`
    (adam_registration.py:108-126: Adam lr=1, 50 iters, diffusion
    regularization, triple box smoothing inside the loss).

    :param feat_fix/feat_mov: (C, d, h, w) feature volumes
    :return: (disp, losses) — the final *smoothed* displacement field
        (matching the reference's `fitted_grid`) and the per-step losses
    """
    dhw = feat_fix.shape[1:]
    id_xyz = _identity_grid_xyz(dhw)
    disp0 = jnp.zeros((*dhw, 3), jnp.float32) if init_disp is None \
        else init_disp.astype(jnp.float32)
    opt = optax.adam(lr)

    def body(carry, _):
        disp, st = carry
        loss, g = jax.value_and_grad(_loss_fn)(disp, feat_fix, feat_mov,
                                               id_xyz, lambda_weight)
        upd, st = opt.update(g, st)
        return (optax.apply_updates(disp, upd), st), loss

    (disp, _), losses = jax.lax.scan(body, (disp0, opt.init(disp0)),
                                     None, length=iters)
    return _box_smooth3(disp), losses


@functools.partial(jax.jit, static_argnames=("out_shape", "grid_sp"))
def upsample_displacement(disp_lo: jnp.ndarray, out_shape,
                          grid_sp: int = GRID_SP) -> jnp.ndarray:
    """Low-res zyx-voxel displacement -> full-res *normalized xyz*
    displacement: trilinear upsample of disp*grid_sp + triple box smoothing
    (adam_registration.py:129-135)."""
    hr = jax.image.resize(disp_lo * grid_sp, (*out_shape, 3), "trilinear")
    hr = _box_smooth3(hr)
    size_zyx = jnp.asarray(out_shape, jnp.float32)
    return (hr * 2.0 / size_zyx)[..., ::-1]


@functools.partial(jax.jit, static_argnames=("mode",))
def warp_volume(vol: jnp.ndarray, disp_norm: jnp.ndarray,
                mode: str = "bilinear") -> jnp.ndarray:
    """Sample `vol` ((D,H,W) or (C,D,H,W)) at identity + normalized-xyz
    displacement (adam_registration.py:165-168)."""
    id_xyz = _identity_grid_xyz(vol.shape[-3:])
    return grid_sample_volume(vol, id_xyz + disp_norm, mode=mode,
                              padding_mode="border")


def landmark_tre_mm(lm_fix: jnp.ndarray, lm_mov: jnp.ndarray,
                    disp_norm: jnp.ndarray, spacing_mm) -> tuple:
    """Target registration error in mm before/after applying the field
    (adam_registration.py:146-159): the displacement is sampled at the
    fixed-image landmarks.

    :param lm_fix/lm_mov: (N, 3) normalized xyz landmark coords
    :param disp_norm: (D, H, W, 3) normalized xyz displacement
    :param spacing_mm: per-axis xyz voxel spacing in mm
    :return: (tre_before, tre_after) — (N,) distances in mm
    """
    shape_xyz = jnp.asarray(disp_norm.shape[:3][::-1], jnp.float32)
    half_mm = shape_xyz / 2.0 * jnp.asarray(spacing_mm, jnp.float32)
    d = grid_sample_volume(jnp.moveaxis(disp_norm, -1, 0), lm_fix,
                           mode="bilinear").T          # (N, 3) xyz
    before = jnp.sqrt(jnp.sum(jnp.square((lm_fix - lm_mov) * half_mm), -1))
    after = jnp.sqrt(jnp.sum(jnp.square((lm_fix + d - lm_mov) * half_mm), -1))
    return before, after


def register_images(img_fix_hu: jnp.ndarray, img_mov_hu: jnp.ndarray,
                    mask_fix=None, mask_mov=None, fissures_fix=None,
                    fissures_mov=None, lobes_fix=None, lobes_mov=None,
                    iters: int = 50, lambda_weight: float = 0.65,
                    lr: float = 1.0, grid_sp: int = GRID_SP):
    """End-to-end pair registration (adam_registration.py:64-175 main body).

    :return: dict with 'disp' (full-res normalized xyz displacement),
        'disp_lo' (low-res zyx voxel field), 'losses', 'warped' (moving
        image resampled into fixed space)
    """
    feat_fix = registration_features(img_fix_hu, mask_fix, fissures_fix,
                                     lobes_fix, grid_sp=grid_sp)
    feat_mov = registration_features(img_mov_hu, mask_mov, fissures_mov,
                                     lobes_mov, grid_sp=grid_sp)
    disp_lo, losses = dense_adam_registration(
        feat_fix, feat_mov, iters=iters, lambda_weight=lambda_weight, lr=lr)
    disp = upsample_displacement(disp_lo, tuple(img_fix_hu.shape), grid_sp)
    warped = warp_volume(img_mov_hu, disp)
    return {"disp": disp, "disp_lo": disp_lo, "losses": losses,
            "warped": warped}
