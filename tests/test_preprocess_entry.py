"""preprocess_dataset.py process_case — writes the case npz including the
left/right lung-half mask (`mask_lr`, the reference's `_masklr_` files)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_process_case_writes_mask_lr(tmp_path):
    from fissure_segmentation_tpu.data.synthetic import \
        make_synthetic_image_case
    import preprocess_dataset as pd

    case = make_synthetic_image_case(0, shape=(48, 48, 48))
    pd.process_case(case["image"], case["lobes"], (1.0, 1.0, 1.0),
                    str(tmp_path), "CASE000")
    with np.load(tmp_path / "CASE000_img_fixed.npz") as z:
        assert "mask_lr" in z
        lr = z["mask_lr"]
        lung = z["lung_mask"] > 0
        assert set(np.unique(lr)) <= {0, 1, 2}
        # left/right labels exactly tile the lung mask
        assert ((lr > 0) == lung).all()
        if (lr == 1).any() and (lr == 2).any():
            assert np.nonzero(lr == 2)[2].mean() < np.nonzero(lr == 1)[2].mean()
