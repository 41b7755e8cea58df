"""Train-time accuracy evidence for --knn_recall 0.9 (VERDICT r4 item 6).

Trains the canonical CV5 protocol (DGCNN seg, 2048 pts, k=40 static, NNU,
cosine, 800 epochs, amp bf16 — identical to the committed
results/demo_tpu_canonical_cv5 run incl. its cross_val_split.json) with
APPROXIMATE kNN graphs during training (--knn_recall 0.9, the config behind
the 406-clouds/s bench row), tests every fold, and writes

    results/demo_tpu_canonical_cv5/cv_results_knn09.csv

plus a printed exact-vs-approx delta table (n = 5 folds x 4 cases). The
reference's own training stochasticity baseline: random keypoint subsets
per epoch (reference data.py:435-460).

Run on the TPU host: python scripts/eval_knn09_training.py [--epochs 800]
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fissure_segmentation_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

import numpy as np

EXACT_DIR = "results/demo_tpu_canonical_cv5"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default="results/demo_tpu_canonical_cv5_knn09")
    ap.add_argument("--epochs", type=int, default=800)
    ap.add_argument("--skip_train", action="store_true")
    opts = ap.parse_args()

    from train_point_seg import run
    from fissure_segmentation_tpu.cli import get_point_segmentation_parser

    argv = ["--ds", "synthetic", "--coords", "--pts", "2048", "--k", "40",
            "--static", "--batch", "16", "--epochs", str(opts.epochs),
            "--scheduler", "cosine", "--knn_recall", "0.9",
            "--split", os.path.join(EXACT_DIR, "cross_val_split.json"),
            "--output", opts.output]
    args = get_point_segmentation_parser().parse_args(argv)
    if not opts.skip_train:
        run(args)  # trains + tests all 5 folds -> cv_results.csv

    src = os.path.join(opts.output, "cv_results.csv")
    dst = os.path.join(EXACT_DIR, "cv_results_knn09.csv")
    shutil.copyfile(src, dst)
    print(f"wrote {dst}")

    def read_cv(path):
        rows = {}
        with open(path) as f:
            for line in f:
                parts = line.strip().split(",")
                rows[parts[0]] = [float(v) for v in parts[1:]]
        return rows

    exact = read_cv(os.path.join(EXACT_DIR, "cv_results.csv"))
    approx = read_cv(dst)
    print("\n| metric | exact-trained | knn_recall=0.9-trained | delta |")
    print("|---|---|---|---|")
    for key, label in (("mean_dice", "Dice (fg mean)"),
                       ("mean_assd", "ASSD [mm]"),
                       ("mean_hd95", "HD95 [mm]")):
        if key == "mean_dice":
            e, a = np.mean(exact[key][1:]), np.mean(approx[key][1:])
            es = np.mean(exact["std_dice"][1:])
            as_ = np.mean(approx["std_dice"][1:])
        else:
            e, a = np.mean(exact[key]), np.mean(approx[key])
            es = np.mean(exact[key.replace("mean", "std")])
            as_ = np.mean(approx[key.replace("mean", "std")])
        print(f"| {label} | {e:.4f} ± {es:.4f} | {a:.4f} ± {as_:.4f} | "
              f"{a - e:+.4f} |")


if __name__ == "__main__":
    main()
