"""Test-time label-space conversions (train/evaluation.py): binary left/right
relabel (fissure_utils.py:8-29) and sparse-lobes -> fissures random-walk
conversion (train.py:230-247)."""
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.train.evaluation import (
    binary_to_fissure_labels, lobe_points_to_fissure_labels)


def test_binary_relabel():
    lung_lr = np.zeros((10, 10, 10), np.int32)
    lung_lr[:, :, 6:] = 1   # left lung at large x
    lung_lr[:, :, :4] = 2   # right lung at small x
    pts = np.array([[5, 5, 7], [5, 5, 2], [5, 5, 5], [5, 5, 8]])
    pred = np.array([1, 1, 1, 0])
    out = binary_to_fissure_labels(pred, pts, lung_lr)
    # left lung point -> 1, right -> 2, outside lung -> 0, not predicted -> 0
    np.testing.assert_array_equal(out, [1, 2, 0, 0])


def test_binary_relabel_clips_out_of_range():
    lung_lr = np.ones((4, 4, 4), np.int32)
    out = binary_to_fissure_labels(np.array([1]), np.array([[9, 9, 9]]),
                                   lung_lr)
    assert out[0] == 1


def test_lobe_points_to_fissures():
    """Two lobes stacked in z inside one lung: the recovered fissure must sit
    at the z-interface."""
    shape = (24, 16, 16)
    lung = np.zeros(shape, bool)
    lung[2:22, 2:14, 2:14] = True
    zz = np.arange(shape[0])[:, None, None]
    # left-lung lobes 3 (LLL) / 4 (LUL) -> their interface is fissure 1 (LOF)
    gt_lobes = np.where(lung & (zz < 12), 3, np.where(lung, 4, 0))

    # sparse point samples of the lobes (simulating point predictions)
    rng = np.random.default_rng(0)
    idx = np.argwhere(gt_lobes > 0)
    sel = idx[rng.permutation(len(idx))[:600]]
    pred_lobes = gt_lobes[sel[:, 0], sel[:, 1], sel[:, 2]]

    pt_labels, fis_map = lobe_points_to_fissure_labels(pred_lobes, sel, lung)
    zs = np.argwhere(fis_map > 0)[:, 0]
    assert len(zs) > 20
    assert 10 <= zs.mean() <= 14          # interface near z=12
    assert set(np.unique(fis_map)) <= {0, 1}  # only LOF; no fabricated labels
    # points near the interface get the fissure label, far points don't
    near = np.abs(sel[:, 0] - 12) <= 1
    far = np.abs(sel[:, 0] - 12) > 3
    assert pt_labels[far].sum() == 0
