"""One-command CT-case inference: image + lung mask -> fissure meshes,
labelmap and an interactive viewer.

The reference exposes serving only through `train.py --test` over a
preprocessed dataset folder (train.py:179-321); this CLI drives the fused
one-dispatch serving path (`serving.segment_case`) directly on a single
case, so a user can go from a preprocessed (unit-spacing) CT volume to
artifacts without building a dataset:

    python scripts/serve_case.py --image case_img.nii.gz \
        --mask case_mask.nii.gz --model results/run/fold0/model.fst \
        --out out_dir [--kp_mode foerstner] [--fast] [--no_labelmap]
    python scripts/serve_case.py --synthetic 0 --model ... --out out_dir

Outputs in --out: fissure{1..K}_pred.obj, fissures_pred.nii.gz (unless
--no_labelmap), keypoints.npz (zyx voxel indices + labels) and
viewer.html (offline interactive WebGL scene).

--fast enables the opt-in fast variant (bf16 compute + knn_recall=0.9
graphs + approximate detector top-k; accuracy deltas in README).
--kp_mode cnn additionally needs --cnn_model (a MobileNetASPP checkpoint);
the full-volume CNN forward is fused into the same device dispatch.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("--image", help="unit-spacing CT volume (.nii[.gz] or "
                                    ".npz with array under 'image')")
    ap.add_argument("--mask", help="lung mask volume (same grid)")
    ap.add_argument("--synthetic", type=int, metavar="SEED",
                    help="use a synthetic 256^3 case instead of --image/--mask")
    ap.add_argument("--model", required=True,
                    help="point-seg checkpoint (models/io.py save_model)")
    ap.add_argument("--cnn_model", help="MobileNetASPP checkpoint for "
                                        "--kp_mode cnn")
    ap.add_argument("--out", required=True)
    ap.add_argument("--kp_mode", default="foerstner",
                    choices=["foerstner", "enhancement", "cnn"])
    ap.add_argument("--fast", action="store_true",
                    help="bf16 + knn_recall=0.9 + approx detector top-k")
    ap.add_argument("--no_labelmap", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fissure_segmentation_tpu.models.io import load_model
    from fissure_segmentation_tpu.serving import segment_case
    from fissure_segmentation_tpu.utils.mesh_viewer import export_mesh_viewer
    from fissure_segmentation_tpu.utils.objio import save_obj

    if args.synthetic is not None:
        from fissure_segmentation_tpu.data.synthetic import \
            make_synthetic_image_case
        case = make_synthetic_image_case(args.synthetic, shape=(256, 256, 256))
        img, mask = case["image"], case["lung_mask"].astype(bool)
        spacing = (1.0, 1.0, 1.0)
    else:
        if not (args.image and args.mask):
            ap.error("--image and --mask are required without --synthetic")
        img, spacing = _load_volume(args.image)
        mask, _ = _load_volume(args.mask)
        mask = mask > 0

    model, variables = load_model(args.model)
    if args.fast:
        model = model.clone(dtype=jnp.bfloat16, knn_recall=0.9)

    cnn_kw = {}
    if args.kp_mode == "cnn":
        if not args.cnn_model:
            ap.error("--kp_mode cnn needs --cnn_model")
        cnn, cnn_vars = load_model(args.cnn_model)
        cnn_kw = dict(cnn_apply_fn=cnn.apply, cnn_variables=cnn_vars,
                      cnn_dtype=jnp.bfloat16)

    res = segment_case(
        jnp.asarray(np.asarray(img, np.float32)), jnp.asarray(mask),
        model.apply, variables, jax.random.PRNGKey(args.seed),
        kp_mode=args.kp_mode, center_x=img.shape[2] / 2,
        make_labelmap=not args.no_labelmap, approx_top_k=args.fast, **cnn_kw)

    os.makedirs(args.out, exist_ok=True)
    for c, (tris, valid) in enumerate(res.meshes, start=1):
        t = tris[valid]
        verts = t.reshape(-1, 3)
        faces = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
        save_obj(os.path.join(args.out, f"fissure{c}_pred.obj"), verts, faces)
    np.savez_compressed(os.path.join(args.out, "keypoints.npz"),
                        kpts=res.kpts, labels=res.labels)
    if res.labelmap is not None:
        from fissure_segmentation_tpu.utils.nifti import save_nifti
        save_nifti(os.path.join(args.out, "fissures_pred.nii.gz"),
                   res.labelmap.astype(np.uint8), spacing=spacing)
    export_mesh_viewer(res.meshes, os.path.join(args.out, "viewer.html"),
                       points=res.kpts[:, ::-1].astype(np.float32),
                       point_labels=res.labels, title="predicted fissures")
    n_tris = [int(v.sum()) for _, v in res.meshes]
    print(f"wrote {args.out}: {len(res.kpts)} keypoints, "
          f"triangles per class {n_tris}")
    return res


def _load_volume(path: str):
    import numpy as np
    if path.endswith(".npz"):
        with np.load(path) as z:
            key = "image" if "image" in z.files else z.files[0]
            return z[key], (1.0, 1.0, 1.0)
    from fissure_segmentation_tpu.utils.nifti import load_nifti
    im = load_nifti(path)
    return im.array, tuple(im.spacing)


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    main()
