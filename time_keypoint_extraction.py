"""Per-mode keypoint/feature extraction timing harness.

Counterpart of reference data_processing/time_keypoint_extraction.py: time
the foerstner / enhancement / cnn keypoint modes and the MIND / MIND-SSC /
patch feature computations per case over a processed dataset, writing one
CSV per mode with mean +- std (write_times, :228-242) into
results/preproc_timing/.

Timing methodology: each timed unit is one jitted call; the first call per
mode is discarded (compile), subsequent cases use `block_until_ready` on
device outputs before stopping the clock.
"""
from __future__ import annotations

import argparse
import csv
import os
import time
from glob import glob

import numpy as np


def write_times(out_filename: str, times, num_points=None) -> None:
    """(time_keypoint_extraction.py:228-242) one-row mean/std CSV."""
    times = np.asarray(times, np.float64)
    with open(out_filename, "w", newline="") as f:
        w = csv.writer(f)
        header = ["Inference", "Inference_std"]
        row = [times.mean() if len(times) else float("nan"),
               times.std() if len(times) else float("nan")]
        if num_points is not None:
            header += ["points", "points_std"]
            npts = np.asarray(num_points, np.float64)
            row += [npts.mean(), npts.std()]
        w.writerow(header)
        w.writerow(row)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", default=None,
                        help="folder of processed *_img_*.npz cases")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="generate N synthetic cases instead")
    parser.add_argument("--shape", type=int, default=128,
                        help="synthetic volume edge length")
    parser.add_argument("--output", default="results/preproc_timing")
    parser.add_argument("--modes", nargs="+",
                        default=["foerstner", "enhancement", "cnn", "mind",
                                 "ssc", "patch"])
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fissure_segmentation_tpu.keypoints import (
        descriptor_at_keypoints, foerstner_keypoints, get_cnn_keypoints,
        get_enhancement_keypoints, hessian_fissure_enhancement, mind)
    from fissure_segmentation_tpu.keypoints.extraction import MAX_KPTS
    from fissure_segmentation_tpu.models import (MobileNetASPP,
                                                 predict_full_volume)
    from fissure_segmentation_tpu.utils.coords import kpts_to_grid
    from fissure_segmentation_tpu.utils.sampling import sample_patches_at_kpts

    os.makedirs(args.output, exist_ok=True)

    cases = []
    if args.data_dir:
        for path in sorted(glob(os.path.join(args.data_dir, "*_img_*.npz"))):
            with np.load(path) as z:
                cases.append((z["image"], z["lung_mask"]))
    else:
        from fissure_segmentation_tpu.data.synthetic import \
            make_synthetic_image_case
        n = args.synthetic or 3
        for i in range(n):
            c = make_synthetic_image_case(i, shape=(args.shape,) * 3)
            cases.append((c["image"], c["lung_mask"]))
    if not cases:
        raise FileNotFoundError("no cases found")

    cnn = cnn_vars = None
    if "cnn" in args.modes:
        cnn = MobileNetASPP(num_classes=4)
        cnn_vars = cnn.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 64, 1), jnp.float32),
                            train=False)

    timers: dict[str, list] = {m: [] for m in args.modes}
    kpt_counts: dict[str, list] = {}
    seen: set = set()  # (mode, shape) pairs whose compile call was discarded

    def timed(key, fn, shape):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        # the first call per (mode, volume shape) compiles — discard it;
        # with --data_dir every distinct case shape retraces the jit
        recorded = (key, shape) in seen
        if recorded:
            timers[key].append(time.perf_counter() - t0)
        seen.add((key, shape))
        return out, recorded

    # feature timings need keypoints even when foerstner isn't timed itself
    need_kpts = bool({"foerstner", "mind", "ssc", "patch"} & set(args.modes))

    for i, (img_np, mask_np) in enumerate(cases):
        img = jnp.asarray(img_np, jnp.float32)
        mask = jnp.asarray(mask_np) > 0
        rng = jax.random.PRNGKey(i)
        shape = img.shape

        if need_kpts:
            # production/reference config: sigma=0.5, nms d=5, thresh 1e-8
            # (keypoints/extraction.py:128-130,
            # reference time_keypoint_extraction.py:110)
            def run_foerstner():
                return foerstner_keypoints(img, mask, sigma=0.5, d=5,
                                           thresh=1e-8, max_kpts=MAX_KPTS)
            if "foerstner" in args.modes:
                (kp, valid, _), recorded = timed("foerstner", run_foerstner,
                                                 shape)
                if recorded:
                    kpt_counts.setdefault("foerstner", []).append(
                        int(np.asarray(valid).sum()))
            else:
                kp, valid, _ = run_foerstner()
        if "enhancement" in args.modes:
            timed("enhancement", lambda: get_enhancement_keypoints(
                hessian_fissure_enhancement(img, -313.5, 62.6)), shape)
        if "cnn" in args.modes:
            def run_cnn():
                soft = predict_full_volume(cnn.apply, cnn_vars, img,
                                           dtype=jnp.bfloat16)
                return get_cnn_keypoints(soft, mask, rng=rng,
                                         max_kpts=MAX_KPTS)
            timed("cnn", run_cnn, shape)
        if need_kpts:
            kpg = kpts_to_grid(kp[:, ::-1].astype(jnp.float32), img.shape)
            if "mind" in args.modes:
                timed("mind", lambda: descriptor_at_keypoints(
                    mind(img, ssc=False), kpg), shape)
            if "ssc" in args.modes:
                timed("ssc", lambda: descriptor_at_keypoints(
                    mind(img, ssc=True), kpg), shape)
            if "patch" in args.modes:
                timed("patch", lambda: sample_patches_at_kpts(
                    img, kpg, 5), shape)

    name_map = {"foerstner": "foerstner_kpts.csv",
                "enhancement": "enhancement_kpts.csv",
                "cnn": "cnn_kpts.csv", "mind": "mind_feat.csv",
                "ssc": "ssc_feat.csv", "patch": "patch_feat.csv"}
    for mode, ts in timers.items():
        if not ts:
            continue
        write_times(os.path.join(args.output, name_map[mode]), ts,
                    num_points=kpt_counts.get(mode))
        print(f"{mode}: {np.mean(ts):.4f} +- {np.std(ts):.4f} s "
              f"({len(ts)} cases)")


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    main()
