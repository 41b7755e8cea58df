import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.keypoints.extraction import (compute_keypoints,
                                                           get_enhancement_keypoints,
                                                           get_noisy_keypoints)


def _toy_volume(n=48):
    """CT-ish volume with one bright plane 'fissure' at z = n//2."""
    rng = np.random.default_rng(0)
    img = rng.normal(-800, 30, (n, n, n)).astype(np.float32)
    fissures = np.zeros((n, n, n), np.int32)
    fissures[n // 2, 8:-8, 8:-8] = 1
    img[n // 2, 8:-8, 8:-8] = -300
    mask = np.zeros((n, n, n), bool)
    mask[4:-4, 4:-4, 4:-4] = True
    return img, fissures, mask


def test_noisy_mode():
    img, fissures, mask = _toy_volume()
    case = compute_keypoints(jax.random.PRNGKey(0), img, fissures, mask,
                             kp_mode="noisy", max_kpts=2000, dilate_labels=2)
    assert case["coords"].shape[1] == 3
    assert len(case["coords"]) > 100
    # noise sigma=3 vs +-2.5-voxel dilated slab: ~60% recapture expected
    assert (case["labels"] == 1).mean() > 0.4


def test_foerstner_mode():
    img, fissures, mask = _toy_volume(32)
    case = compute_keypoints(jax.random.PRNGKey(0), img, fissures, mask,
                             kp_mode="foerstner", max_kpts=2000, dilate_labels=1)
    assert len(case["coords"]) > 50
    assert np.abs(case["coords"]).max() <= 1.0


def test_enhancement_mode():
    img, fissures, mask = _toy_volume(32)
    case = compute_keypoints(jax.random.PRNGKey(1), img, fissures, mask,
                             kp_mode="enhancement", max_kpts=2000,
                             dilate_labels=1)
    # enhancement keypoints should cluster on the bright plane
    assert len(case["coords"]) > 20
    assert (case["labels"] == 1).mean() > 0.5


def test_cnn_mode():
    img, fissures, mask = _toy_volume(24)
    # fake softmax: high class-1 prob on the fissure plane
    sm = np.zeros((24, 24, 24, 2), np.float32)
    sm[..., 0] = 0.9
    sm[12, 8:-8, 8:-8, 0] = 0.1   # CNN fires exactly on the labeled fissure
    sm[12, 8:-8, 8:-8, 1] = 0.9
    case = compute_keypoints(jax.random.PRNGKey(0), img, fissures, mask,
                             kp_mode="cnn", cnn_softmax=sm, max_kpts=500,
                             dilate_labels=1)
    assert case["features"].shape == (len(case["coords"]), 2 * 125)
    assert (case["labels"] == 1).mean() > 0.8


def test_feature_modes_attach_features():
    """feature_mode wires point_features.py:153-208 into the pipeline and
    records kp/feature provenance in the case dict."""
    img, fissures, mask = _toy_volume(24)
    for feat, dim in (("mind_ssc", 12), ("mind", 6), ("image", 125)):
        case = compute_keypoints(jax.random.PRNGKey(0), img, fissures, mask,
                                 kp_mode="foerstner", max_kpts=500,
                                 dilate_labels=1, feature_mode=feat)
        assert case["features"].shape == (len(case["coords"]), dim)
        assert np.isfinite(case["features"]).all()
        assert case["kp_mode"] == "foerstner"
        assert case["feature_mode"] == feat


def test_feature_mode_roundtrips_through_npz(tmp_path):
    from fissure_segmentation_tpu.data.dataset import (load_case_npz,
                                                       save_case_npz)
    img, fissures, mask = _toy_volume(24)
    case = compute_keypoints(jax.random.PRNGKey(0), img, fissures, mask,
                             kp_mode="foerstner", max_kpts=500,
                             dilate_labels=1, feature_mode="mind_ssc")
    path = save_case_npz(case, str(tmp_path))
    back = load_case_npz(path)
    assert back["kp_mode"] == "foerstner"
    assert back["feature_mode"] == "mind_ssc"
    np.testing.assert_allclose(back["features"], case["features"])


def test_cnn_keypoints_approx_subsample_same_distribution():
    """approx_top_k on get_cnn_keypoints picks a uniformly random FG subset
    (the scores are random; reference keypoint_extraction.py:144-151 keeps a
    random subset past MAX_KPTS) — every selected voxel must be foreground
    inside the mask, and when fg count <= max_kpts the selection is exactly
    the foreground set."""
    import jax.numpy as jnp

    from fissure_segmentation_tpu.keypoints.extraction import get_cnn_keypoints

    rng = np.random.default_rng(3)
    sm = np.zeros((16, 16, 16, 2), np.float32)
    sm[..., 0] = 1.0
    fg = rng.random((16, 16, 16)) < 0.1
    sm[fg, 0], sm[fg, 1] = 0.1, 0.9
    mask = np.ones((16, 16, 16), bool)
    mask[:2] = False

    for approx in (False, True):
        kp, valid, _ = get_cnn_keypoints(
            jnp.asarray(sm), jnp.asarray(mask), max_kpts=256,
            rng=jax.random.PRNGKey(0), want_features=False,
            approx_top_k=approx)
        kp, valid = np.asarray(kp), np.asarray(valid)
        want = fg & mask
        # fg (~340) > max_kpts: both paths must fill the budget with
        # foreground-only voxels (a uniformly random subset)
        assert want.sum() > 256
        assert valid.sum() == 256
        sel = kp[valid]
        assert want[sel[:, 0], sel[:, 1], sel[:, 2]].all()
        assert len(np.unique(sel[:, 0] * 256 + sel[:, 1] * 16
                             + sel[:, 2])) == 256
