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


def main(run_dir="results/demo_tpu_canonical_cv5", n_folds=None):
    cases = make_synthetic_dataset(20, n_points=8000, gt_surfaces=True)
    ds = PointDataset(cases, sample_points=2048)
    split = load_split_file(os.path.join(run_dir, "cross_val_split.json"))
    n_folds = int(n_folds) if n_folds is not None else len(split)
    out_root = os.path.join(run_dir, "fast_variant_eval")

    # every fold's validation cases through its OWN fold weights -> the
    # deltas cover all 20 cases, not fold-0's 4 (VERDICT r3 item 7)
    acc = {"exact": {}, "fast": {}}
    per_fold = []
    for fold in range(n_folds):
        _, val_ds = ds.split_data_set(split[fold], fold_nr=fold)
        val_ds.do_augmentation = False
        model, variables = load_model(
            os.path.join(run_dir, f"fold{fold}", "model.fst"))
        variants = {
            "exact": model.clone(dtype=None, knn_recall=None),
            "fast": model.clone(dtype=jnp.bfloat16, knn_recall=0.9),
        }
        fold_res = {}
        for name, m in variants.items():
            res = test_pipeline(
                val_ds, m.apply, variables,
                os.path.join(out_root, name, f"fold{fold}"),
                sample_points=2048, export_artifacts=False)
            fold_res[name] = res
            for metric in ("dice", "assd", "hd"):
                v = np.asarray(res[metric], float)
                if metric == "dice":   # drop the background column
                    v = v[..., 1:] if v.ndim > 1 else v[1:]
                acc[name].setdefault(metric, []).append(np.nanmean(v))
        per_fold.append(fold_res)
        print(f"fold {fold}: exact dice "
              f"{acc['exact']['dice'][-1]:.4f} vs fast "
              f"{acc['fast']['dice'][-1]:.4f}", flush=True)

    n_cases = sum(len(split[f]["val"]) for f in range(n_folds))
    rows = []
    for metric in ("dice", "assd", "hd"):
        e = float(np.mean(acc["exact"][metric]))
        f = float(np.mean(acc["fast"][metric]))
        rows.append((metric, e, f, f - e))
    print(f"\n| Metric ({n_folds}-fold CV, {n_cases} cases, mean over "
          "fissures) | exact (f32, exact kNN) | fast (bf16, "
          "knn_recall=0.9) | delta |")
    print("|---|---|---|---|")
    for name, e, f, d in rows:
        print(f"| {name} | {e:.4f} | {f:.4f} | {d:+.4f} |")
    with open(os.path.join(out_root, "deltas.csv"), "w") as fh:
        fh.write(f"# {n_folds}-fold CV, {n_cases} cases\n")
        fh.write("metric,exact,fast,delta\n")
        for name, e, f, d in rows:
            fh.write(f"{name},{e:.6f},{f:.6f},{d:.6f}\n")
    with open(os.path.join(out_root, "deltas_per_fold.csv"), "w") as fh:
        fh.write("fold,metric,exact,fast,delta\n")
        for fold in range(n_folds):
            for metric in ("dice", "assd", "hd"):
                e = acc["exact"][metric][fold]
                f = acc["fast"][metric][fold]
                fh.write(f"{fold},{metric},{e:.6f},{f:.6f},{f - e:.6f}\n")
    print(f"\nwrote {out_root}/deltas.csv and deltas_per_fold.csv")


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    main(*sys.argv[1:])
