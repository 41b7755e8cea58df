"""binary_lung_mask_to_left_right (preprocess/labels.py) — the producer of
the `_masklr_` companion files. Reference:
/root/reference/data_processing/process_lung_mask.py:11-93."""
import numpy as np

from fissure_segmentation_tpu.preprocess import (
    binary_lung_mask_to_left_right, check_left_right_lung_plausible)


def _two_lungs(shape=(32, 40, 48), gap=4):
    """Two boxes separated along x; right lung = smaller x."""
    m = np.zeros(shape, bool)
    xm = shape[2] // 2
    m[4:-4, 4:-4, 4:xm - gap // 2] = True          # right (small x)
    m[4:-4, 4:-4, xm + gap // 2:-4] = True         # left (large x)
    return m


def test_plausibility_check():
    assert check_left_right_lung_plausible([100, 90])
    assert not check_left_right_lung_plausible([100])
    assert not check_left_right_lung_plausible([100, 5])


def test_separated_lungs_labeled_left_right():
    m = _two_lungs()
    lr = binary_lung_mask_to_left_right(m)
    assert set(np.unique(lr)) == {0, 1, 2}
    # right lung (smaller x) gets label 2, left gets 1
    xs_right = np.nonzero(lr == 2)[2]
    xs_left = np.nonzero(lr == 1)[2]
    assert xs_right.mean() < xs_left.mean()
    # labels exactly cover the mask
    assert ((lr > 0) == m).all()


def test_touching_lungs_get_detached_and_restored():
    m = _two_lungs(gap=4)
    # connect the lungs with a thin bridge -> single component initially
    m[14:18, 18:22, :] = True
    lr = binary_lung_mask_to_left_right(m)
    assert set(np.unique(lr)) == {0, 1, 2}
    # every original mask voxel is assigned a side (EDT restoration)
    assert ((lr > 0) == m).all()
    # sides are still ordered correctly
    assert np.nonzero(lr == 2)[2].mean() < np.nonzero(lr == 1)[2].mean()


def test_single_component_capped():
    m = np.zeros((16, 16, 16), bool)
    m[4:12, 4:12, 4:12] = True
    lr = binary_lung_mask_to_left_right(m, max_opening_radius=3)
    # cannot split one blob: everything becomes one (left) label, no crash
    assert set(np.unique(lr)) <= {0, 1}


def test_empty_mask():
    lr = binary_lung_mask_to_left_right(np.zeros((8, 8, 8), bool))
    assert (lr == 0).all()


def test_single_component_opened_still_covers_mask():
    """When the opening ran but only one component exists, the EDT restore
    must still reassign every original mask voxel (no dropped voxels)."""
    m = np.zeros((24, 24, 24), bool)
    m[4:20, 4:20, 4:20] = True
    m[4:20, 4:6, 20:22] = True   # thin flap the opening erodes away
    # two same-size blobs ratio fine -> force implausibility via a speck
    m2 = m.copy()
    m2[1, 1, 1] = True           # tiny second component -> ratio implausible
    lr = binary_lung_mask_to_left_right(m2, max_opening_radius=3)
    covered = (lr > 0) == m2
    assert covered.all()
