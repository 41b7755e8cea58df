"""Dataset preprocessing entry point.

CLI counterpart of reference preprocess_totalsegmentator_dataset.py (__main__)
and label_preprocessing_pipeline.py: iterate raw cases, crop/flip/clamp +
derive GT (fissures, lung mask), run the 4-step label pipeline (Poisson
regularization -> masking -> lobes -> keypoints/features) and write the
processed volumes, meshes and point files.

Input: a folder of ``{case}_raw.npz`` files with arrays ``image`` (D,H,W HU)
and ``lobes`` (D,H,W lobe labels) [+ optional ``spacing``], or
``--synthetic N`` to generate demo cases. Output artifacts mirror the
reference's directory layout (``*_img_*.npz``, ``*_mesh_*`` folders,
``*_points_*.npz``).
"""
from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np


def process_case(img, lobes, spacing, out_dir: str, case: str,
                 sequence: str = "fixed", kp_mode: str = "foerstner",
                 cnn_model_path: str | None = None,
                 feature_mode: str | None = None, legacy_v1: bool = False):
    from fissure_segmentation_tpu.preprocess.labels import \
        binary_lung_mask_to_left_right
    from fissure_segmentation_tpu.preprocess.pipeline import (
        label_pipeline_case, preprocess_totalsegmentator_case)

    pre = preprocess_totalsegmentator_case(img, lobes, legacy_v1=legacy_v1)
    # left/right lung-half mask (the reference's separate process_lung_mask
    # step writing `_masklr_` files) — needed for the 'binary' label space
    mask_lr = binary_lung_mask_to_left_right(np.asarray(pre["lung_mask"]))
    np.savez_compressed(
        os.path.join(out_dir, f"{case}_img_{sequence}.npz"),
        image=pre["image"], lobes=pre["lobes"], fissures=pre["fissures"],
        lung_mask=pre["lung_mask"], mask_lr=mask_lr,
        spacing=np.asarray(spacing, np.float32))
    out = label_pipeline_case(pre["image"], pre["fissures"],
                              pre["lung_mask"], out_dir, case, sequence,
                              kp_mode=kp_mode, spacing=spacing,
                              cnn_model_path=cnn_model_path,
                              feature_mode=feature_mode)
    if out.get("points") is not None:
        from fissure_segmentation_tpu.data.dataset import save_case_npz
        save_case_npz(out["points"], out_dir)
    return out


def evaluate_enhancement(folder: str) -> None:
    """Hessian-enhancement quality harness over processed cases
    (reference fissure_enhancement.py __main__ + :223-310): per case the
    ROC/AP summary and the Dice/recall/accuracy threshold sweep, plots per
    case and a summary CSV."""
    import csv

    import jax.numpy as jnp

    from fissure_segmentation_tpu.keypoints import (fissure_candidates,
                                                    hessian_fissure_enhancement)

    files = sorted(glob(os.path.join(folder, "*_img_*.npz")))
    if not files:
        raise FileNotFoundError(f"no *_img_*.npz cases in {folder}")
    eval_dir = os.path.join(folder, "enhancement_eval")
    os.makedirs(eval_dir, exist_ok=True)
    rows = [["case", "roc_auc_all", "avg_prec_all", "best_threshold",
             "best_dice"]]
    for path in files:
        case = os.path.basename(path).split("_img_")[0]
        with np.load(path) as z:
            img, fissures = z["image"], z["fissures"]
        enhanced = np.asarray(hessian_fissure_enhancement(
            jnp.asarray(img), fissure_mu=-313.5, fissure_sigma=62.6))
        roc_auc, avg_prec, th, dice, _, _ = fissure_candidates(
            enhanced, fissures, img_dir=eval_dir, img_prefix=f"{case}_")
        auc, ap = roc_auc.get("all"), avg_prec.get("all")
        if auc is None:
            # degenerate GT (no fissure voxels, or all-foreground) — the
            # threshold sweep skips such groups; record NaN, keep going
            print(f"{case}: degenerate fissure GT, skipped")
            rows.append([case, float("nan"), float("nan"), float("nan"),
                         float("nan")])
            continue
        rows.append([case, auc, ap, float(th[int(np.argmax(dice))]),
                     float(dice.max())])
        print(f"{case}: AUC={auc:.4f} AP={ap:.4f} "
              f"best dice={dice.max():.4f}")
    with open(os.path.join(eval_dir, "enhancement_eval.csv"), "w") as f:
        csv.writer(f).writerows(rows)
    print(f"wrote {eval_dir}/enhancement_eval.csv")


def main(argv=None):
    parser = argparse.ArgumentParser(description="preprocess a CT dataset")
    parser.add_argument("--data_dir", default=None,
                        help="folder of {case}_raw.npz inputs")
    parser.add_argument("--output", default="results/preprocessed")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="generate N synthetic demo cases instead")
    parser.add_argument("--kp_mode", default="foerstner")
    parser.add_argument("--feature", default=None,
                        choices=["mind", "mind_ssc", "image", "enhancement"],
                        help="per-point features to attach to the point "
                             "files (reference point_features.py:153-208); "
                             "default: none (cnn kp_mode keeps its "
                             "softmax-patch features)")
    parser.add_argument("--cnn_model", default=None,
                        help="trained seg-CNN checkpoint (.fst) for "
                             "kp_mode=cnn (e.g. seg_cnn_out/fold0/model.fst)")
    parser.add_argument("--sequence", default="fixed")
    parser.add_argument("--v1", action="store_true",
                        help="legacy TotalSegmentator-v1 crop semantics "
                             "(preprocess_totalsegmentator_dataset_v1.py: "
                             "z_pad 20, raw z-range, unclamped HU) — the "
                             "crops the reference's qualitative.py figures "
                             "consume; also applies the v1 exclusion list "
                             "of incomplete-lobe cases")
    parser.add_argument("--evaluate_enhancement", action="store_true",
                        help="evaluate the Hessian fissure-enhancement "
                             "filter (ROC/AP + Dice-vs-threshold sweep, "
                             "fissure_enhancement.py:223-310) over the "
                             "processed *_img_*.npz cases in --output")
    args = parser.parse_args(argv)

    os.makedirs(args.output, exist_ok=True)
    if args.evaluate_enhancement:
        evaluate_enhancement(args.output)
        return
    if args.synthetic:
        from fissure_segmentation_tpu.data.synthetic import \
            make_synthetic_image_case
        for i in range(args.synthetic):
            case = make_synthetic_image_case(i)
            # synthetic cases carry HU-like intensities in [-1, 1); rescale
            img = case["image"] * 1000.0
            process_case(img, case["lobes"], case["spacing"], args.output,
                         case["case_id"], args.sequence, args.kp_mode,
                         cnn_model_path=args.cnn_model,
                         feature_mode=args.feature, legacy_v1=args.v1)
            print(f"processed {case['case_id']}")
        return
    if not args.data_dir:
        parser.error("--data_dir or --synthetic required")
    from fissure_segmentation_tpu.preprocess.pipeline import EXCLUDE_LIST_V1
    excluded = {f"s{i:04d}" for i in EXCLUDE_LIST_V1}
    for path in sorted(glob(os.path.join(args.data_dir, "*_raw.npz"))):
        case = os.path.basename(path).replace("_raw.npz", "")
        if args.v1 and case in excluded:
            print(f"skipping {case} (v1 exclusion list: incomplete lobes)")
            continue
        with np.load(path) as z:
            img = z["image"]
            lobes = z["lobes"]
            spacing = z["spacing"] if "spacing" in z else (1.0, 1.0, 1.0)
        process_case(img, lobes, spacing, args.output, case, args.sequence,
                     args.kp_mode, cnn_model_path=args.cnn_model,
                     feature_mode=args.feature, legacy_v1=args.v1)
        print(f"processed {case}")


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    main()
