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


def test_qualitative_plots_entry(tmp_path):
    """qualitative_plots.py main: overlay / keypoint / LR-schedule figures."""
    import qualitative_plots as qp

    qp.main(["--output", str(tmp_path)])
    for f in ["fissure_overlay.png", "keypoints.png", "cosine_annealing.png",
              "cosine_annealing_warm_restarts.png", "cosine_annealing_both.png"]:
        assert (tmp_path / f).stat().st_size > 0


def test_cosine_lr_trace_matches_trainer():
    """Plain-cosine trace == the trainer's closed-form _cosine_lr."""
    import math

    from qualitative_plots import cosine_lr_trace

    epochs, lr = 100, 1e-3
    tr = cosine_lr_trace(epochs, lr)
    min_lr = lr * 0.05
    ref = [min_lr + (lr - min_lr) * (1 + math.cos(math.pi * e / epochs)) / 2
           for e in range(1, epochs + 1)]
    np.testing.assert_allclose(tr, ref, rtol=1e-12)
    # warm restarts actually restart
    wr = cosine_lr_trace(epochs, lr, t_max=25, warm_restarts=True)
    assert wr[24] > wr[23]


@pytest.mark.slow
def test_process_case_cnn_mode(tmp_path):
    """kp_mode='cnn' in the preprocessing pipeline loads the seg-CNN
    checkpoint and produces keypoints from its full-volume softmax
    (reference keypoint_extraction.py:53-131)."""
    import jax
    import jax.numpy as jnp
    from fissure_segmentation_tpu.data.synthetic import \
        make_synthetic_image_case
    from fissure_segmentation_tpu.models import MobileNetASPP
    from fissure_segmentation_tpu.models.io import save_model
    import preprocess_dataset as pd

    cnn = MobileNetASPP(num_classes=4)
    variables = cnn.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 32, 1), jnp.float32),
                         train=False)
    ckpt = tmp_path / "model.fst"
    save_model(cnn, variables, str(ckpt))

    case = make_synthetic_image_case(1, shape=(48, 48, 48))
    out = pd.process_case(case["image"], case["lobes"], (1.0, 1.0, 1.0),
                          str(tmp_path), "CNN000", kp_mode="cnn",
                          cnn_model_path=str(ckpt))
    pts = out.get("points")
    assert pts is not None and len(pts["coords"]) > 0
    assert pts["coords"].shape[1] == 3
    # cnn mode also attaches softmax-patch features
    assert "features" in pts and pts["features"].shape[0] == len(pts["coords"])
