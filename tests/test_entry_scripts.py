"""Smoke tests for the per-model entry scripts (train_pc_ae.py,
train_dgcnn_ssm.py, train_dpsr_net.py, train_seg_cnn.py,
dseg_ae_regularization.py) — tiny synthetic configs, one fold, train+test.
The reference's equivalents are its repo-root entry scripts (SURVEY.md §1
L7)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_train_pc_ae_entry(tmp_path):
    import train_pc_ae
    parser = train_pc_ae.get_pc_ae_train_parser()
    args = parser.parse_args(
        ["--ds", "synthetic", "--output", str(tmp_path), "--epochs", "2",
         "--batch", "4", "--pts", "64", "--k", "8", "--latent", "32",
         "--fold", "0", "--static", "--scheduler", "none"])
    train_pc_ae.run(args)
    assert os.path.exists(tmp_path / "fold0" / "model.fst")
    assert os.path.exists(tmp_path / "fold0" / "test" /
                          "reconstruction_chamfer.csv")
    assert os.path.exists(tmp_path / "cv_results.csv")


@pytest.mark.slow
def test_train_dgcnn_ssm_entry(tmp_path):
    import train_dgcnn_ssm
    parser = train_dgcnn_ssm.get_dgcnn_ssm_train_parser()
    args = parser.parse_args(
        ["--ds", "synthetic", "--output", str(tmp_path), "--epochs", "3",
         "--batch", "4", "--pts", "64", "--k", "8", "--fold", "0", "--static",
         "--scheduler", "none", "--predict_affine",
         "--head_schedule", '{"main": 0, "translation": 0, "rotation": 1, "scaling": 2}'])
    train_dgcnn_ssm.run(args)
    assert os.path.exists(tmp_path / "fold0" / "ssm.npz")
    assert os.path.exists(tmp_path / "fold0" / "model.fst")
    assert os.path.exists(tmp_path / "fold0" / "test" /
                          "corr_point_distance.csv")


@pytest.mark.slow
def test_train_seg_cnn_entry(tmp_path):
    import train_seg_cnn
    parser = train_seg_cnn.get_seg_cnn_train_parser()
    args = parser.parse_args(
        ["--ds", "synthetic", "--output", str(tmp_path), "--epochs", "2",
         "--batch", "2", "--patch_size", "32", "--spacing", "1.0",
         "--fold", "0", "--scheduler", "none"])
    train_seg_cnn.run(args)
    assert os.path.exists(tmp_path / "fold0" / "model.fst")
    assert os.path.exists(tmp_path / "fold0" / "test" / "test_dice.csv")


@pytest.mark.slow
def test_train_dpsr_entry(tmp_path):
    import train_dpsr_net
    parser = train_dpsr_net.get_dpsr_train_parser()
    args = parser.parse_args(
        ["--ds", "synthetic", "--output", str(tmp_path), "--epochs", "2",
         "--batch", "2", "--pts", "128", "--k", "8", "--fold", "0", "--static",
         "--scheduler", "none", "--res", "32", "32", "32", "--train_only"])
    train_dpsr_net.run(args)
    assert os.path.exists(tmp_path / "fold0" / "model.fst")


@pytest.mark.slow
def test_train_dpsr_v1_entry(tmp_path):
    """DPSRNet v1 (per-class extraction + estimated normals) selectable via
    --dpsr_version 1 (reference models/dpsr_net.py:107-185)."""
    import train_dpsr_net
    parser = train_dpsr_net.get_dpsr_train_parser()
    args = parser.parse_args(
        ["--ds", "synthetic", "--output", str(tmp_path), "--epochs", "2",
         "--batch", "2", "--pts", "128", "--k", "8", "--fold", "0", "--static",
         "--scheduler", "none", "--res", "32", "32", "32", "--train_only",
         "--dpsr_version", "1"])
    train_dpsr_net.run(args)
    assert os.path.exists(tmp_path / "fold0" / "model.fst")


@pytest.mark.slow
def test_copd_transfer_validation_entry(tmp_path):
    """--copd swaps the validation set for the COPD cohort and writes _copd
    CSVs (reference data.py:486-498, train.py:342,563,631-634)."""
    import train_point_seg
    parser = train_point_seg.get_point_segmentation_parser()
    base = ["--ds", "synthetic", "--output", str(tmp_path), "--epochs", "2",
            "--batch", "4", "--pts", "128", "--k", "8", "--fold", "0",
            "--static", "--scheduler", "none", "--coords"]
    train_point_seg.run(parser.parse_args(base + ["--train_only"]))
    assert os.path.exists(tmp_path / "fold0" / "model.fst")

    train_point_seg.run(parser.parse_args(base + ["--copd"]))
    assert os.path.exists(tmp_path / "fold0" / "test" / "test_results_copd.csv")
    assert os.path.exists(tmp_path / "fold0" / "test" /
                          "dice_per_instance_copd.csv")
    assert os.path.exists(tmp_path / "cv_results_copd.csv")
    # the COPD cohort (not the training cases) was evaluated
    import csv
    with open(tmp_path / "fold0" / "test" / "dice_per_instance_copd.csv") as f:
        rows = list(csv.reader(f))
    assert any("COPD" in r[0] for r in rows[1:])


@pytest.mark.slow
def test_ae_reg_entry(tmp_path):
    """Train tiny seg + AE nets via their entry points, then compose."""
    import train_pc_ae
    import train_point_seg
    import dseg_ae_regularization as ae_reg

    seg_dir, ae_dir = str(tmp_path / "seg"), str(tmp_path / "ae")
    p1 = train_point_seg.get_point_segmentation_parser()
    a1 = p1.parse_args(["--ds", "synthetic", "--output", seg_dir, "--epochs",
                        "2", "--batch", "4", "--pts", "128", "--k", "8",
                        "--fold", "0", "--static", "--scheduler", "none",
                        "--train_only", "--coords"])
    train_point_seg.run(a1)

    p2 = train_pc_ae.get_pc_ae_train_parser()
    a2 = p2.parse_args(["--ds", "synthetic", "--output", ae_dir, "--epochs",
                        "2", "--batch", "4", "--pts", "64", "--k", "8",
                        "--latent", "32", "--fold", "0", "--static",
                        "--scheduler", "none", "--train_only"])
    train_pc_ae.run(a2)

    p3 = ae_reg.get_ae_reg_parser()
    a3 = p3.parse_args(["--ds", "synthetic", "--output", str(tmp_path / "reg"),
                        "--seg_dir", seg_dir, "--ae_dir", ae_dir])
    ae_reg.run(a3)
    assert os.path.exists(tmp_path / "reg" / "fold0" / "ae_reg_results.csv")


def test_register_images_entry(tmp_path, monkeypatch):
    """register_images.py end-to-end on tiny synthetic NIfTI pairs."""
    import jax.numpy as jnp
    from fissure_segmentation_tpu.utils.nifti import load_nifti, save_nifti
    from fissure_segmentation_tpu.shape_model.adam_registration import (
        _identity_grid_xyz, warp_volume)
    import register_images as ri

    shape = (16, 16, 16)
    rng = np.random.RandomState(0)
    mov = rng.randn(4, 4, 4)
    import jax
    mov = np.asarray(jax.image.resize(jnp.asarray(mov), shape, "trilinear"))
    disp = 0.05 * np.asarray(jnp.sin(_identity_grid_xyz(shape) * 3))
    fix = np.asarray(warp_volume(jnp.asarray(mov), jnp.asarray(disp)))
    mask = np.ones(shape, np.uint8)

    for name, arr in [("fix_img.nii.gz", fix), ("mov_img.nii.gz", mov),
                      ("fix_mask.nii.gz", mask), ("mov_mask.nii.gz", mask)]:
        save_nifti(str(tmp_path / name), arr)
    np.savez(tmp_path / "lms.npz",
             lm_fix=rng.uniform(-0.5, 0.5, (10, 3)).astype(np.float32),
             lm_mov=rng.uniform(-0.5, 0.5, (10, 3)).astype(np.float32))

    monkeypatch.setattr(sys, "argv", [
        "register_images.py", "-F", str(tmp_path / "fix_img.nii.gz"),
        "-M", str(tmp_path / "mov_img.nii.gz"),
        "-f", str(tmp_path / "fix_mask.nii.gz"),
        "-m", str(tmp_path / "mov_mask.nii.gz"),
        "-w", str(tmp_path / "warped.nii.gz"),
        "-d", str(tmp_path / "disp.npz"),
        "-l", str(tmp_path / "lms.npz"), "--iters", "5"])
    ri.main()
    assert os.path.exists(tmp_path / "warped.nii.gz")
    d = np.load(tmp_path / "disp.npz")
    assert d["disp"].shape == (*shape, 3)
    assert load_nifti(str(tmp_path / "warped.nii.gz")).array.shape == shape


def test_qualitative_plots_entry(tmp_path):
    """qualitative_plots.py CLI: overlay, keypoint, comparison and LR-schedule
    figures (reference qualitative.py:49-126 + keypoint_plots.py +
    thesis/cosine_annealing.py)."""
    import qualitative_plots as qp
    out = str(tmp_path / "plots")
    qp.main(["--output", out])
    for name in ("fissure_overlay.png", "keypoints.png",
                 "keypoint_qualitative_comparison_synthetic_slice32.png",
                 "keypoint_qualitative_comparison_legend.png",
                 "classes_legend.png", "cosine_annealing.png",
                 "performance_time.png"):
        assert os.path.exists(os.path.join(out, name)), name
    # at least one per-class overlay slice was written
    assert any(f.startswith("DGCNN_synthetic_slice")
               for f in os.listdir(out))


def test_compute_fraction_of_fissures_entry(tmp_path):
    """compute_fraction_of_fissures.py: per-label mm^3/voxel stats CSV
    (reference compute_fraction_of_fissures.py)."""
    import csv

    import compute_fraction_of_fissures as cff

    out = str(tmp_path / "sizes.csv")
    cff.main(["--n_synthetic", "2", "--output", out])
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3 and rows[-1]["case"] == "mean"  # 2 cases + mean
    for row in rows[:-1]:
        assert float(row["all_mm3"]) > 0
        assert int(row["total_size_n_vox"]) > 0
        # sanity: per-label voxels sum to the total fissure count
        per_label = sum(int(v) for k, v in row.items()
                        if k.endswith("_n_vox") and k.startswith("fissure_"))
        assert per_label == int(row["all_n_vox"])


@pytest.mark.slow
def test_speed_entry_loads_trained_args(tmp_path):
    """--speed loads the trained run's stored args (reference cli_utils.py
    override whitelist) instead of clobbering commandline_args.json, and
    writes inference_time.csv."""
    import json

    import train_point_seg
    parser = train_point_seg.get_point_segmentation_parser()
    base = ["--ds", "synthetic", "--output", str(tmp_path), "--epochs", "2",
            "--batch", "4", "--pts", "128", "--k", "8", "--fold", "0",
            "--static", "--scheduler", "none", "--coords"]
    train_point_seg.run(parser.parse_args(base + ["--train_only"]))
    stored = json.load(open(tmp_path / "commandline_args.json"))

    # speed invocation with DIFFERENT hyperparams: stored config must win
    # and must NOT be overwritten
    train_point_seg.run(parser.parse_args(
        ["--output", str(tmp_path), "--speed", "--pts", "64", "--k", "4"]))
    assert os.path.exists(tmp_path / "inference_time.csv")
    after = json.load(open(tmp_path / "commandline_args.json"))
    assert after["pts"] == stored["pts"] == 128
    assert after["k"] == stored["k"] == 8


def test_experiment_grid_scripts_parse():
    """bash -n syntax check of the experiment-grid scripts (scripts/*.sh)."""
    import glob
    import subprocess

    scripts = glob.glob(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "*.sh"))
    assert scripts, "no grid scripts found"
    for s in scripts:
        subprocess.run(["bash", "-n", s], check=True)


@pytest.mark.slow
def test_serve_case_entry(tmp_path):
    """scripts/serve_case.py: single-case fused serving CLI — npz image +
    mask + tiny trained checkpoint -> OBJ meshes, labelmap NIfTI, keypoints
    npz and the interactive viewer HTML (reference has no single-case CLI;
    its serving runs only through train.py --test, train.py:179-321)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import serve_case

    from fissure_segmentation_tpu.data.synthetic import \
        make_synthetic_image_case
    from fissure_segmentation_tpu.models import DGCNNSeg
    from fissure_segmentation_tpu.models.io import save_model

    case = make_synthetic_image_case(0, shape=(48, 48, 48))
    np.savez(tmp_path / "img.npz", image=case["image"])
    np.savez(tmp_path / "mask.npz", image=case["lung_mask"].astype(np.uint8))

    model = DGCNNSeg(k=8, in_features=3, num_classes=4, dynamic=False)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 3), jnp.float32))
    save_model(model, variables, str(tmp_path / "model.fst"))

    out = tmp_path / "out"
    res = serve_case.main([
        "--image", str(tmp_path / "img.npz"),
        "--mask", str(tmp_path / "mask.npz"),
        "--model", str(tmp_path / "model.fst"), "--out", str(out),
        "--kp_mode", "foerstner"])
    assert (out / "fissure1_pred.obj").exists()
    assert (out / "fissures_pred.nii.gz").exists()
    assert (out / "viewer.html").exists()
    kp = np.load(out / "keypoints.npz")
    assert len(kp["kpts"]) == len(kp["labels"]) > 0
    assert res.labelmap.shape == (48, 48, 48)
