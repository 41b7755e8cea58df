"""Deformable CT pair registration by Adam instance optimization.

Counterpart of reference shape_model/adam_registration.py __main__
(:178-200): register a moving (inspiration) scan onto a fixed (exhale)
scan using MIND-SSC + label features, write the warped image / displacement
field, and report landmark TRE when landmarks are given.

Label volumes are discovered next to the images via the reference's naming
convention (img -> fissures_poisson / lobes, adam_registration.py:196-199)
and are optional.  Landmarks replace the reference's hard-coded
`copd_converted_lms.pth` with an explicit --landmarks .npz
(lm_fix/lm_mov arrays of (N,3) normalized xyz coords + spacing).
"""
import os
from argparse import ArgumentParser

import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.shape_model import (landmark_tre_mm,
                                                  register_images)
from fissure_segmentation_tpu.utils.nifti import load_nifti, save_nifti


def _maybe(path):
    """Load an *optional* companion volume; None when absent."""
    if path and os.path.exists(path):
        return jnp.asarray(load_nifti(path).array)
    return None


def _require(path, what):
    """Load a required volume; a missing file is an error, not a silent
    unmasked/label-free registration."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"{what} not found: {path}")
    return jnp.asarray(load_nifti(path).array)


def _companion(img_path, tag):
    """Swap 'img' for `tag` in the *basename* only (the reference's
    full-path replace corrupts paths whose directories contain 'img')."""
    d, b = os.path.split(img_path)
    return os.path.join(d, b.replace("img", tag))


def main():
    parser = ArgumentParser()
    parser.add_argument("-F", "--fixed_file", required=True,
                        help="fixed scan (exhale) nii.gz")
    parser.add_argument("-M", "--moving_file", required=True,
                        help="moving scan (inspiration) nii.gz")
    parser.add_argument("-f", "--fixed_mask_file", required=True)
    parser.add_argument("-m", "--moving_mask_file", required=True)
    parser.add_argument("-w", "--warped_file", default=None,
                        help="output warped image nii.gz")
    parser.add_argument("-d", "--disp_file", default=None,
                        help="output displacement-field .npz")
    parser.add_argument("-l", "--landmarks", default=None,
                        help=".npz with lm_fix, lm_mov (N,3 normalized xyz) "
                             "and spacing (3,) for TRE evaluation")
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--lambda_weight", type=float, default=0.65)
    args = parser.parse_args()

    fix = load_nifti(args.fixed_file)
    mov = load_nifti(args.moving_file)
    res = register_images(
        jnp.asarray(fix.array), jnp.asarray(mov.array),
        mask_fix=_require(args.fixed_mask_file, "fixed mask"),
        mask_mov=_require(args.moving_mask_file, "moving mask"),
        fissures_fix=_maybe(_companion(args.fixed_file, "fissures_poisson")),
        fissures_mov=_maybe(_companion(args.moving_file, "fissures_poisson")),
        lobes_fix=_maybe(_companion(args.fixed_file, "lobes")),
        lobes_mov=_maybe(_companion(args.moving_file, "lobes")),
        iters=args.iters, lambda_weight=args.lambda_weight)
    print(f"final cost {float(res['losses'][-1]):.5f} "
          f"(initial {float(res['losses'][0]):.5f})")

    if args.warped_file:
        save_nifti(args.warped_file, np.asarray(res["warped"]),
                   spacing=fix.spacing)
    if args.disp_file:
        np.savez_compressed(args.disp_file, disp=np.asarray(res["disp"]),
                            disp_lo=np.asarray(res["disp_lo"]))
    if args.landmarks:
        lm = np.load(args.landmarks)
        before, after = landmark_tre_mm(
            jnp.asarray(lm["lm_fix"], jnp.float32),
            jnp.asarray(lm["lm_mov"], jnp.float32),
            res["disp"],
            lm["spacing"] if "spacing" in lm.files else np.ones(3))
        print(f"TRE before {float(before.mean()):.3f} mm -> "
              f"after {float(after.mean()):.3f} mm")


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    main()
