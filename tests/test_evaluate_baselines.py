"""evaluate_baselines.py smoke test: a tiny reference-layout data dir +
one predicted labelmap through all three evaluation modes (reference
evaluate_baselines.py:24-466)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["voxels", "surface", "subsample"])
def test_evaluate_baselines_modes(tmp_path, mode):
    from argparse import Namespace

    from fissure_segmentation_tpu.utils.nifti import save_nifti
    import evaluate_baselines as eb

    shape = (32, 32, 32)
    data = tmp_path / "data"
    preds = tmp_path / "preds"
    os.makedirs(data); os.makedirs(preds)

    img = np.zeros(shape, np.float32)
    fissures = np.zeros(shape, np.int16)
    fissures[14, 8:24, 8:24] = 1
    fissures[20, 8:24, 8:24] = 2
    mask = np.zeros(shape, np.uint8)
    mask[4:28, 4:28, 4:28] = 1
    save_nifti(str(data / "case0_img_fixed.nii.gz"), img)
    save_nifti(str(data / "case0_fissures_fixed.nii.gz"), fissures)
    save_nifti(str(data / "case0_mask_fixed.nii.gz"), mask)

    pred = np.zeros(shape, np.int16)
    pred[15, 8:24, 8:24] = 1          # 1 voxel off fissure 1
    pred[20, 8:24, 8:24] = 2          # exact fissure 2
    save_nifti(str(preds / "case0_fixed.nii.gz"), pred)

    out = tmp_path / f"out_{mode}"
    eb.main(Namespace(result_dir=str(preds), data_dir=str(data),
                      output=str(out), split=None, mode=mode,
                      pts_subsample=500, n_fissures=2))
    res = out / "fold0" / f"test_results_{mode}.csv"
    assert res.exists()
    rows = res.read_text().strip().splitlines()
    assert len(rows) >= 2
    cv = out / f"cv_results_{mode}.csv"
    assert cv.exists()
