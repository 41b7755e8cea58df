"""Canonical 5-fold synthetic cross-validation + exact-vs-fast accuracy
deltas (VERDICT r2 items 3 & 5).

Phase 1 trains/tests all 5 folds of the canonical reference config (DGCNN
seg, 2048 pts, k=40 static, NNU loss, cosine — the results/demo_tpu_canonical
protocol) on the synthetic dataset -> cv_results.csv with cross-fold std.

Phase 2 re-tests every fold's trained weights with the FAST serving-variant
model — bf16 compute + approximate kNN graphs (knn_recall=0.9) — into
fold*/test_fast and cv_results_fast.csv, then prints the exact-vs-fast
Dice/ASSD delta table for README. (The approx detector top-k has no stage in
this point-cloud-level protocol; its recall is covered by bench.py on
device.)

Run on the TPU host:  python scripts/run_canonical_cv.py --output
results/demo_tpu_canonical_cv [--epochs 800]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default="results/demo_tpu_canonical_cv")
    ap.add_argument("--epochs", type=int, default=800)
    ap.add_argument("--skip_train", action="store_true",
                    help="phase 2 only (folds already trained)")
    opts = ap.parse_args()

    from train_point_seg import build_dataset, run
    from fissure_segmentation_tpu.cli import get_point_segmentation_parser

    argv = ["--ds", "synthetic", "--coords", "--pts", "2048", "--k", "40",
            "--static", "--batch", "16", "--epochs", str(opts.epochs),
            "--scheduler", "cosine", "--output", opts.output]
    args = get_point_segmentation_parser().parse_args(argv)

    if not opts.skip_train:
        run(args)  # trains + tests all 5 folds -> cv_results.csv

    # ---- phase 2: fast-variant re-test of the SAME trained weights ----
    from fissure_segmentation_tpu.data import load_split_file
    from fissure_segmentation_tpu.models import load_model
    from fissure_segmentation_tpu.models.io import _module_config
    from fissure_segmentation_tpu.train.cross_val import write_cv_results
    from fissure_segmentation_tpu.train.evaluation import test_pipeline

    ds = build_dataset(args)
    split = load_split_file(os.path.join(opts.output, "cross_val_split.json"))
    fold_metrics = []
    for fold in range(len(split)):
        fold_dir = os.path.join(opts.output, f"fold{fold}")
        model, variables = load_model(os.path.join(fold_dir, "model.fst"))
        cfg = _module_config(model)
        cfg.update(dtype=jnp.bfloat16, knn_recall=0.9)
        cfg = {k: tuple(v) if isinstance(v, list) else v
               for k, v in cfg.items()}
        fast_model = type(model)(**cfg)
        _, val_ds = ds.split_data_set(split[fold], fold_nr=fold)
        val_ds.do_augmentation = False
        m = test_pipeline(val_ds, fast_model.apply, variables,
                          os.path.join(fold_dir, "test_fast"),
                          sample_points=args.pts, export_artifacts=False)
        fold_metrics.append(m)
        print(f"fold {fold} fast: dice {np.nanmean(m['dice'][1:]):.4f} "
              f"assd {np.nanmean(m['assd']):.3f}", flush=True)
    write_cv_results(os.path.join(opts.output, "cv_results_fast.csv"),
                     fold_metrics)

    # ---- delta table ----
    def read_cv(path):
        rows = {}
        with open(path) as f:
            for line in f:
                parts = line.strip().split(",")
                rows[parts[0]] = [float(v) for v in parts[1:]]
        return rows

    exact = read_cv(os.path.join(opts.output, "cv_results.csv"))
    fast = read_cv(os.path.join(opts.output, "cv_results_fast.csv"))
    print("\n| metric | exact (mean ± std over folds) | fast | delta |")
    print("|---|---|---|---|")
    for key, label in (("mean_dice", "Dice (fg mean)"),
                       ("mean_assd", "ASSD [mm]"),
                       ("mean_hd95", "HD95 [mm]")):
        if key == "mean_dice":
            e = np.mean(exact[key][1:])
            fa = np.mean(fast[key][1:])
            es = np.mean(exact["std_dice"][1:])
            fs = np.mean(fast["std_dice"][1:])
        else:
            e, fa = np.mean(exact[key]), np.mean(fast[key])
            es = np.mean(exact[key.replace("mean", "std")])
            fs = np.mean(fast[key.replace("mean", "std")])
        print(f"| {label} | {e:.4f} ± {es:.4f} | {fa:.4f} ± {fs:.4f} | "
              f"{fa - e:+.4f} |")


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    main()
