import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fissure_segmentation_tpu.keypoints import foerstner_keypoints, distinctiveness
from fissure_segmentation_tpu.keypoints.hessian import (eigvalsh3,
                                                        hessian_fissure_enhancement)


def _torch_distinctiveness(img, sigma):
    """Reference distinctiveness (data_processing/foerstner.py:7-73)."""
    from tests.test_filters import _torch_filter_1d

    def smooth_t(x, s):
        N = int(torch.ceil(torch.tensor(s) * 3.0 / 2.0).item()) * 2 + 1
        w = torch.exp(-torch.pow(torch.linspace(-(N // 2), N // 2, N), 2) / (2 * s ** 2))
        w /= w.sum()
        for dim in range(3):
            x = _torch_filter_1d(x, w, dim)
        return x

    filt = torch.tensor([1.0 / 12.0, -8.0 / 12.0, 0.0, 8.0 / 12.0, -1.0 / 12.0])
    grad = torch.cat([_torch_filter_1d(img, filt, d) for d in range(3)], dim=1)
    struct = []
    for i in range(3):
        for j in range(i, 3):
            struct.append(smooth_t((grad[:, i] * grad[:, j]).unsqueeze(1), sigma))
    s = torch.cat(struct, dim=1)
    a, b, c, e, f, i_ = (s[:, k] for k in range(6))
    A = e * i_ - f * f
    E = a * i_ - c * c
    I = a * e - b * b
    B = -b * i_ + c * f
    C = b * f - c * e
    det = (a * A + b * B + c * C).unsqueeze(1)
    struct_inv = (1.0 / det) * torch.stack([A, E, I], dim=1)
    return 1.0 / struct_inv.sum(dim=1, keepdim=True)


def test_distinctiveness_matches_reference(rng):
    img = rng.normal(size=(16, 18, 20)).astype(np.float32)
    ref = _torch_distinctiveness(torch.from_numpy(img)[None, None], 1.4)
    ours = distinctiveness(jnp.asarray(img), 1.4)
    np.testing.assert_allclose(np.asarray(ours), ref[0, 0].numpy(), rtol=1e-3, atol=1e-6)


def test_foerstner_keypoints_are_local_maxima(rng):
    img = rng.normal(size=(24, 24, 24)).astype(np.float32)
    mask = np.ones((24, 24, 24), bool)
    kpts, valid, n = foerstner_keypoints(jnp.asarray(img), jnp.asarray(mask),
                                         sigma=1.4, d=5, max_kpts=64)
    n = int(n)
    assert n > 0
    kpts = np.asarray(kpts)[np.asarray(valid)]
    d = np.asarray(distinctiveness(jnp.asarray(img), 1.4))
    # every keypoint is the max of its 5^3 neighborhood and >= thresh
    for z, y, x in kpts[: min(len(kpts), 20)]:
        lo = lambda v: max(v - 2, 0)
        nb = d[lo(z):z + 3, lo(y):y + 3, lo(x):x + 3]
        assert d[z, y, x] >= nb.max() - 1e-12
        # note: like the reference (zero-padded erosion conv,
        # foerstner.py:103), volume-border voxels are NOT excluded when the
        # mask is all-ones — only mask-interior borders are eroded.


def test_foerstner_mask_respected(rng):
    img = rng.normal(size=(16, 16, 16)).astype(np.float32)
    mask = np.zeros((16, 16, 16), bool)
    mask[:, :, :8] = True  # only left half allowed
    kpts, valid, n = foerstner_keypoints(jnp.asarray(img), jnp.asarray(mask),
                                         d=3, max_kpts=32)
    kpts = np.asarray(kpts)[np.asarray(valid)]
    assert np.all(kpts[:, 2] < 8)


def test_eigvalsh3_matches_numpy(rng):
    m = rng.normal(size=(100, 3, 3)).astype(np.float64)
    sym = (m + np.swapaxes(m, -1, -2)) / 2
    ref = np.linalg.eigvalsh(sym)  # ascending
    ours = eigvalsh3(sym[:, 0, 0], sym[:, 1, 1], sym[:, 2, 2],
                     sym[:, 0, 1], sym[:, 0, 2], sym[:, 1, 2])
    ours_sorted = np.sort(np.stack([np.asarray(o) for o in ours], -1), axis=-1)
    np.testing.assert_allclose(ours_sorted, ref, rtol=1e-4, atol=1e-5)


def test_hessian_enhancement_highlights_dark_plane():
    # parenchyma at -800 HU, a one-voxel-thick brighter plane at -300 HU
    vol = np.full((32, 32, 32), -800.0, np.float32)
    vol[16, :, :] = -300.0
    enhanced = np.asarray(hessian_fissure_enhancement(
        jnp.asarray(vol), fissure_mu=-300.0, fissure_sigma=100.0))
    assert np.isfinite(enhanced).all()
    on_plane = enhanced[16, 8:24, 8:24].mean()
    off_plane = enhanced[8, 8:24, 8:24].mean()
    assert on_plane > 0.5
    assert on_plane > off_plane + 0.4


def test_enhancement_threshold_sweep_and_roc(tmp_path, rng):
    """fissure_candidates (fissure_enhancement.py:223-310 counterpart):
    a well-separated enhancement image gives high AUC/AP and a peaked
    dice-vs-threshold curve; artifacts are written."""
    from fissure_segmentation_tpu.keypoints.enhancement_eval import \
        fissure_candidates

    labels = np.zeros((24, 24, 24), np.int32)
    labels[8, 4:20, 4:20] = 1     # "left oblique" plane
    labels[16, 4:20, 4:20] = 3    # "right horizontal" plane
    enhanced = rng.uniform(0.0, 0.25, labels.shape).astype(np.float32)
    enhanced[labels != 0] = rng.uniform(0.6, 1.0, (labels != 0).sum())

    roc_auc, avg_prec, th, dice, recall, acc = fissure_candidates(
        enhanced, labels, img_dir=str(tmp_path))
    assert roc_auc["all"] > 0.99 and roc_auc[1] > 0.99
    assert avg_prec["all"] > 0.9
    assert 3 not in [k for k in roc_auc if k == "all_but_RHF"]
    assert roc_auc["all_but_RHF"] > 0.99
    assert len(th) == 21 and dice.shape == (21,)
    # dice peaks between the noise band and the signal band
    best = th[np.argmax(dice)]
    assert 0.25 <= best <= 0.6, best
    assert recall[0] == 1.0            # threshold 0 predicts everything
    assert acc[-1] > 0.9               # threshold 1 predicts nothing
    assert (tmp_path / "roc.png").exists()
    assert (tmp_path / "metrics_per_threshold.png").exists()

    # fixed threshold variant
    _, _, th1, dice1, _, _ = fissure_candidates(enhanced, labels,
                                                fixed_thresh=0.5)
    assert len(th1) == 1 and dice1[0] > 0.9
