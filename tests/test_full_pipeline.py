"""Flagship integration test: train -> ensembled inference -> per-fissure
surface reconstruction -> Dice + ASSD/HD metrics -> CSV artifacts.
(reference flow: train.py run/cross_val/test, SURVEY.md §3.1-3.2)"""
import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.data import PointDataset, make_synthetic_dataset
from fissure_segmentation_tpu.losses import get_loss_fn
from fissure_segmentation_tpu.models import DGCNNSeg
from fissure_segmentation_tpu.train import ModelTrainer, TrainConfig
import pytest

from fissure_segmentation_tpu.train.evaluation import \
    test_pipeline as run_test_pipeline


@pytest.mark.slow
def test_train_then_full_test_pipeline(tmp_path):
    cases = make_synthetic_dataset(8, n_points=1500, gt_surfaces=True)
    ds = PointDataset(cases, sample_points=512)
    model = DGCNNSeg(k=10, in_features=4, num_classes=4, dynamic=False)
    loss_fn = get_loss_fn("nnunet", jnp.asarray(ds.get_class_weights()))
    trainer = ModelTrainer(model, ds, loss_fn, str(tmp_path),
                           TrainConfig(epochs=40, batch_size=8,
                                       scheduler="cosine", show_every=20))
    variables = trainer.run()

    val = PointDataset(cases[:2], sample_points=512, do_augmentation=False)
    results = run_test_pipeline(val, model.apply, variables, str(tmp_path / "test"),
                            sample_points=512, n_runs_min=10,
                            grid_res=(48, 48, 48))
    print("pipeline results:", results)
    assert results["dice"][0] > 0.7          # background
    assert np.nanmean(results["dice"][1:]) > 0.4
    # at least 2 of 3 fissures reconstructed with sane distances (in voxels
    # of a 128^3 volume)
    finite = np.isfinite(results["assd"])
    assert finite.sum() >= 2
    assert np.nanmean(results["assd"]) < 8.0
    assert (tmp_path / "test" / "test_results.csv").exists()
    assert (tmp_path / "test" / "dice_per_instance.csv").exists()
    assert (tmp_path / "test" / "inference_time.csv").exists()
    # per-case artifacts (reference train.py:195-321): meshes, labelmap,
    # pred/target plots for every test case
    pred_dir = tmp_path / "test" / "test_predictions"
    for i in range(len(val)):
        cid = "_".join(str(s) for s in val.ids[i])
        assert (pred_dir / "labelmaps" / f"{cid}_fissures_pred.nii.gz").exists()
        assert (pred_dir / "plots" / f"{cid}_point_cloud_pred.png").exists()
        assert (pred_dir / "plots" / f"{cid}_point_cloud_targ.png").exists()
    meshes = list((pred_dir / "meshes").glob("*_fissure*_pred.obj"))
    assert len(meshes) >= 2   # >= 2 of 3 fissures reconstructed, 2 cases
    # labelmap is a loadable NIfTI with fissure labels
    from fissure_segmentation_tpu.utils.nifti import load_nifti
    img = load_nifti(str(next(iter((pred_dir / "labelmaps").glob("*.nii.gz")))))
    assert img.array.shape == tuple(val.cases[0]["shape"])
    assert img.array.max() >= 1
