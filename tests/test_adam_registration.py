"""Dense Adam instance-optimization registration (shape_model/
adam_registration.py) — recovery of a known smooth deformation, warp
identities, and landmark TRE reduction. Reference behavior:
/root/reference/shape_model/adam_registration.py:64-175."""
import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.shape_model.adam_registration import (
    _identity_grid_xyz, dense_adam_registration, landmark_tre_mm,
    registration_features, register_images, upsample_displacement,
    warp_volume, downsample_mean)


def _smooth_image(shape, seed=0):
    """Band-limited random volume with structure at multiple scales."""
    rng = np.random.RandomState(seed)
    small = rng.randn(*[max(2, s // 4) for s in shape])
    img = jax.image.resize(jnp.asarray(small), shape, "trilinear")
    return img / (jnp.abs(img).max() + 1e-9)


def _gt_disp_norm(shape, amp=0.08):
    """Smooth sinusoidal normalized-xyz displacement, zero near the faces."""
    idx = _identity_grid_xyz(shape)  # (d,h,w,3) xyz in [-1,1]
    window = jnp.prod(jnp.cos(idx * jnp.pi / 2) ** 2, axis=-1,
                      keepdims=True)
    return amp * jnp.sin(idx * jnp.pi * 1.5) * window


def test_warp_identity():
    img = _smooth_image((12, 14, 16))
    out = warp_volume(img, jnp.zeros((12, 14, 16, 3)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_upsample_displacement_units():
    """A constant 1-low-res-voxel zyx displacement upsamples to grid_sp
    full-res voxels = 2*grid_sp/size in normalized units per axis."""
    lo = jnp.ones((8, 8, 8, 3))
    hi = upsample_displacement(lo, (16, 16, 16), grid_sp=2)
    # borders are damped by the zero-padded box smoothing; check interior
    np.testing.assert_allclose(np.asarray(hi[4:-4, 4:-4, 4:-4]),
                               2 * 2 / 16, atol=1e-5)


def test_registration_recovers_known_deformation():
    shape = (24, 24, 24)
    moving = _smooth_image(shape, seed=1)
    disp_gt = _gt_disp_norm(shape)
    # fixed(x) = moving(x + disp_gt(x)) — exactly the model the optimizer fits
    fixed = warp_volume(moving, disp_gt)

    feat_fix = downsample_mean(fixed[None], 2)
    feat_mov = downsample_mean(moving[None], 2)
    disp_lo, losses = dense_adam_registration(feat_fix, feat_mov, iters=80,
                                              lambda_weight=0.1, lr=0.5)
    assert float(losses[-1]) < 0.3 * float(losses[0])

    disp = upsample_displacement(disp_lo, shape)
    warped = warp_volume(moving, disp)
    err_before = float(jnp.mean(jnp.square(moving - fixed)))
    err_after = float(jnp.mean(jnp.square(warped - fixed)))
    assert err_after < 0.35 * err_before

    # landmark TRE at interior points must improve
    lms = jnp.asarray(np.random.RandomState(3).uniform(-0.5, 0.5, (50, 3)),
                      jnp.float32)
    # moving landmark = fixed landmark displaced by the GT field
    d_gt = jnp.stack(
        [jax.scipy.ndimage.map_coordinates(  # sample gt disp at lms (xyz)
            disp_gt[..., c],
            [(lms[:, 2 - i] + 1) * s / 2 - 0.5
             for i, s in enumerate(shape)], order=1)
         for c in range(3)], -1)
    lm_mov = lms + d_gt
    before, after = landmark_tre_mm(lms, lm_mov, disp, (1.0, 1.0, 1.0))
    assert float(after.mean()) < 0.6 * float(before.mean())


def test_register_images_end_to_end():
    shape = (24, 24, 24)
    moving = _smooth_image(shape, seed=2) * 500.0  # HU-ish scale
    disp_gt = _gt_disp_norm(shape, amp=0.05)
    fixed = warp_volume(moving, disp_gt)
    mask = jnp.ones(shape, bool)
    lobes = (moving > 0).astype(jnp.int32)
    res = register_images(fixed, moving, mask_fix=mask, mask_mov=mask,
                          lobes_fix=warp_volume(lobes.astype(jnp.float32),
                                                disp_gt, "nearest"),
                          lobes_mov=lobes, iters=60, lr=0.3)
    assert res["disp"].shape == (*shape, 3)
    assert res["warped"].shape == shape
    assert np.isfinite(np.asarray(res["losses"])).all()
    assert float(res["losses"][-1]) < float(res["losses"][0])


def test_registration_features_odd_dims_with_labels():
    """Odd volume dims: MIND (floor mean-pool) and label one-hots (strided)
    must downsample to identical shapes; fissure-voxel label features must
    survive the one-hot width (lob+fis+max(lob) reaches 13)."""
    from fissure_segmentation_tpu.shape_model.adam_registration import (
        registration_features)
    shape = (17, 19, 21)
    img = _smooth_image(shape) * 300.0
    lobes = np.zeros(shape, np.int32)
    lobes[2:15, 2:17, 2:19] = 5
    fissures = np.zeros(shape, np.int32)
    fissures[8, 5:15, 5:15] = 3           # combined = 5 + 3 + 5 = 13
    feats = np.asarray(registration_features(
        img, jnp.asarray(np.ones(shape, bool)), jnp.asarray(fissures),
        jnp.asarray(lobes)))
    assert feats.shape == (12 + 16, 8, 9, 10)
    # the channel for combined==13 is nonzero at the fissure location
    assert feats[12 + 13].sum() > 0


def test_companion_path_basename_only():
    from register_images import _companion
    p = _companion("/data/imgs/case_img_fixed.nii.gz", "lobes")
    assert p == "/data/imgs/case_lobes_fixed.nii.gz"


def test_required_mask_missing_raises(tmp_path):
    import pytest
    from register_images import _require
    with pytest.raises(FileNotFoundError):
        _require(str(tmp_path / "nope.nii.gz"), "fixed mask")
