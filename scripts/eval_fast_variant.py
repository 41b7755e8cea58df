"""Exact-vs-fast accuracy deltas for the fast serving variant's MODEL knobs.

Runs the canonical synthetic evaluation (the results/demo_tpu_canonical*
protocol: fold-0 validation cases through train.evaluation.test_pipeline)
TWICE with the same trained fold-0 weights:

  exact:  f32 compute, exact kNN graphs        (the headline serving path)
  fast:   bf16 compute + knn_recall=0.9 graphs (segment_case fast variant)

and prints the per-fissure Dice/ASSD delta table for README. The fast
serving variant's third knob — approx_top_k on the Förstner detector —
never enters this protocol (keypoints are dataset inputs); its effect is
keypoint recall, measured on-chip by bench.py (foerstner_detector rows,
0.97 recall at recall_target=0.9).

Usage: python scripts/eval_fast_variant.py [run_dir] (default
results/demo_tpu_canonical_cv5); writes {run_dir}/fast_variant_eval/.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.data import PointDataset, make_synthetic_dataset
from fissure_segmentation_tpu.data.dataset import load_split_file
from fissure_segmentation_tpu.models.io import load_model
from fissure_segmentation_tpu.train.evaluation import test_pipeline


def main(run_dir="results/demo_tpu_canonical_cv5"):
    cases = make_synthetic_dataset(20, n_points=8000, gt_surfaces=True)
    ds = PointDataset(cases, sample_points=2048)
    split = load_split_file(os.path.join(run_dir, "cross_val_split.json"))
    _, val_ds = ds.split_data_set(split[0], fold_nr=0)
    val_ds.do_augmentation = False

    model, variables = load_model(os.path.join(run_dir, "fold0", "model.fst"))
    variants = {
        "exact": model.clone(dtype=None, knn_recall=None),
        "fast": model.clone(dtype=jnp.bfloat16, knn_recall=0.9),
    }
    out_root = os.path.join(run_dir, "fast_variant_eval")
    results = {}
    for name, m in variants.items():
        results[name] = test_pipeline(
            val_ds, m.apply, variables, os.path.join(out_root, name),
            sample_points=2048, export_artifacts=False)

    rows = []
    for metric in ("dice", "assd", "hd"):
        e = np.asarray(results["exact"][metric], float)
        f = np.asarray(results["fast"][metric], float)
        if metric == "dice":          # drop the background column
            e, f = e[1:], f[1:]
        rows.append((metric, np.nanmean(e), np.nanmean(f),
                     np.nanmean(f) - np.nanmean(e)))
    print("\n| Metric (fold-0 val, mean over fissures) | exact "
          "(f32, exact kNN) | fast (bf16, knn_recall=0.9) | delta |")
    print("|---|---|---|---|")
    for name, e, f, d in rows:
        print(f"| {name} | {e:.4f} | {f:.4f} | {d:+.4f} |")
    with open(os.path.join(out_root, "deltas.csv"), "w") as fh:
        fh.write("metric,exact,fast,delta\n")
        for name, e, f, d in rows:
            fh.write(f"{name},{e:.6f},{f:.6f},{d:.6f}\n")
    print(f"\nwrote {out_root}/deltas.csv")


if __name__ == "__main__":
    main(*sys.argv[1:])
