"""time_keypoint_extraction.py — the per-mode preprocessing timing harness
(reference data_processing/time_keypoint_extraction.py)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_write_times(tmp_path):
    from time_keypoint_extraction import write_times
    p = tmp_path / "t.csv"
    write_times(str(p), [1.0, 2.0, 3.0], num_points=[10, 20, 30])
    lines = p.read_text().strip().splitlines()
    assert lines[0].split(",") == ["Inference", "Inference_std",
                                   "points", "points_std"]
    vals = [float(v) for v in lines[1].split(",")]
    assert vals[0] == 2.0 and vals[2] == 20.0


@pytest.mark.slow
def test_timing_harness_end_to_end(tmp_path):
    import time_keypoint_extraction as tke
    tke.main(["--synthetic", "2", "--shape", "32", "--output", str(tmp_path),
              "--modes", "foerstner", "enhancement", "mind", "patch"])
    for f in ["foerstner_kpts.csv", "enhancement_kpts.csv", "mind_feat.csv",
              "patch_feat.csv"]:
        assert (tmp_path / f).exists()
    row = (tmp_path / "foerstner_kpts.csv").read_text().splitlines()[1]
    assert np.isfinite(float(row.split(",")[0]))
