"""Test-only DSEG-AE composition: a trained segmentation DGCNN regularized by
a trained point-cloud autoencoder.

Counterpart of reference dseg_ae_regularization.py:46-468: per fold, load
both models from their cross-validation directories, segment each validation
case with the 50-subset ensemble, FPS/accumulate-sample each fissure class
and reconstruct it with the PC-AE, then evaluate the reconstructed surfaces
against the GT (chamfer to the GT surface samples + per-class Dice of the
input segmentation) and time the whole chain.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.cli import get_ae_reg_parser, load_args_dict
from fissure_segmentation_tpu.data import (PointDataset, load_split_file,
                                           make_synthetic_dataset)
from fissure_segmentation_tpu.losses import chamfer_distance
from fissure_segmentation_tpu.models import RegularizedSegDGCNN, load_model
from fissure_segmentation_tpu.train.evaluation import write_speed_results
from fissure_segmentation_tpu.utils.detached_run import maybe_run_detached_cli


def build_dataset(args, seg_args: dict) -> PointDataset:
    pts = seg_args.get("pts", 2048)
    if args.ds == "synthetic" or args.data_dir is None:
        # train_point_seg's synthetic cases carry 1 feature channel; match it
        cases = make_synthetic_dataset(20, n_points=8000, gt_surfaces=True,
                                       with_feature=True)
        return PointDataset(cases, sample_points=pts,
                            exclude_rhf=seg_args.get("exclude_rhf", False),
                            binary=seg_args.get("binary", False))
    return PointDataset.from_folder(args.data_dir, sample_points=pts)


def evaluate_fold(ds: PointDataset, model: RegularizedSegDGCNN, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    chamfers, times = [], []
    for i in range(len(ds)):
        x, _ = ds.get_full_pointcloud(i)
        x = jnp.asarray(x)
        t0 = time.perf_counter()
        outputs, seg = model(x, jax.random.PRNGKey(i))
        outputs = jax.block_until_ready(outputs)
        times.append(time.perf_counter() - t0)

        gt = ds.cases[i].get("gt_surfaces")
        for cls, out in enumerate(outputs, start=1):
            if out is None or gt is None or cls not in gt:
                continue
            verts = out[0] if isinstance(out, tuple) else out
            verts = verts.reshape(-1, 3)
            # GT surfaces are world xyz; model output is grid coords
            from fissure_segmentation_tpu.utils.coords import kpts_to_grid
            gt_grid = kpts_to_grid(jnp.asarray(gt[cls]), ds.cases[i]["shape"])
            chamfers.append(float(chamfer_distance(verts[None], gt_grid[None])))

    mean = float(np.mean(chamfers)) if chamfers else float("nan")
    with open(os.path.join(out_dir, "ae_reg_results.csv"), "w") as f:
        f.write("mean_chamfer,std_chamfer,mean_time_s\n")
        f.write(f"{mean},{np.std(chamfers) if chamfers else 'nan'},"
                f"{np.mean(times)}\n")
    write_speed_results(out_dir, times)
    print(f"AE-reg chamfer: {mean:.5f}; {np.mean(times):.3f}s/case")
    return {"chamfer": mean}


def run(args):
    os.makedirs(args.output, exist_ok=True)
    seg_args = load_args_dict(args.seg_dir)
    ae_args = load_args_dict(args.ae_dir)

    ds = build_dataset(args, seg_args)
    split_path = os.path.join(args.seg_dir, "cross_val_split.json")
    split = load_split_file(split_path) if os.path.exists(split_path) else None

    fold_metrics = []
    folds = sorted(d for d in os.listdir(args.seg_dir) if d.startswith("fold"))
    for fold_name in folds:
        fold = int(fold_name.replace("fold", ""))
        print(f"------------ FOLD {fold} ----------------------")
        seg_model, seg_vars = load_model(
            os.path.join(args.seg_dir, fold_name, "model.fst"))
        ae_model, ae_vars = load_model(
            os.path.join(args.ae_dir, fold_name, "model.fst"))
        model = RegularizedSegDGCNN(
            seg_model, seg_vars, ae_model, ae_vars,
            n_points_seg=seg_args.get("pts", 2048),
            n_points_ae=ae_args.get("pts", 1024),
            sample_mode=args.sampling,
            random_extend=args.pad_with_random_offsets)

        if split is not None:
            _, val_ds = ds.split_data_set(split[fold])
        else:
            val_ds = ds
        fold_metrics.append(evaluate_fold(
            val_ds, model, os.path.join(args.output, fold_name)))

    vals = [m["chamfer"] for m in fold_metrics if np.isfinite(m["chamfer"])]
    if vals:
        with open(os.path.join(args.output, "cv_results.csv"), "w") as f:
            f.write("fold,chamfer\n")
            for i, m in enumerate(fold_metrics):
                f.write(f"{i},{m['chamfer']}\n")
            f.write(f"mean,{np.mean(vals)}\n")


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    parser = get_ae_reg_parser()
    args = parser.parse_args()
    maybe_run_detached_cli(args)
    run(args)
