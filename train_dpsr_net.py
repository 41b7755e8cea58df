"""Train DPSR-Net: point segmentation + differentiable Poisson surface
reconstruction, supervised by segmentation labels and GT mesh surfaces.

Counterpart of reference train_dpsr_net.py (DPSRNet2 "SoftMesh" path,
models/seg_logits_to_mesh.py): per fold, train the seg-net end-to-end
through splatting -> spectral PSR -> marching -> surface samples with the
epoch-gated DPSR loss (losses/dpsr_loss.py:29-44), then run the standard
point-segmentation test pipeline on the seg logits.
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.cli import (get_dpsr_train_parser,
                                          load_args_for_testing, store_args)
from fissure_segmentation_tpu.data import (PointToMeshDS, create_split,
                                           load_split_file,
                                           make_synthetic_mesh_dataset,
                                           save_split_file)
from fissure_segmentation_tpu.data.mesh_dataset import sample_mesh_batch
from fissure_segmentation_tpu.data.store import sample_batch
from fissure_segmentation_tpu.losses import get_loss_fn
from fissure_segmentation_tpu.models import DPSRNet, DPSRNet2, load_model
from fissure_segmentation_tpu.train import ModelTrainer, TrainConfig
from fissure_segmentation_tpu.train.evaluation import test_pipeline
from fissure_segmentation_tpu.utils.detached_run import maybe_run_detached_cli


def build_dataset(args) -> PointToMeshDS:
    if args.ds == "synthetic" or args.data_dir is None:
        cases, meshes, sizes = make_synthetic_mesh_dataset(
            n_cases=10, grid_n=20, n_points=4000, gt_surfaces=True)
        return PointToMeshDS(cases, meshes, sizes, sample_points=args.pts,
                             exclude_rhf=args.exclude_rhf,
                             binary=args.binary)
    raise NotImplementedError("real-data DPSR training needs *_mesh_* dirs; "
                              "use PointToMeshDS with load_meshes")


def run(args):
    os.makedirs(args.output, exist_ok=True)
    if args.test_only:
        args = load_args_for_testing(args.output, args)
    else:
        store_args(args, args.output)

    ds = build_dataset(args)
    base_loss = get_loss_fn("dpsr", jnp.asarray(ds.get_class_weights()),
                            term_weights=args.loss_weights)

    def loss_fn(out, y, epoch):
        frac = epoch.astype(jnp.float32) / max(args.epochs, 1)
        # predicted surface samples are per fissure class (B, C-1, S, 3)
        # (models/dpsr_net.py soft_mesh_surface_samples); flatten the class
        # dim so the chamfer pairs each class with its GT surface
        pred_seg, pred_pts, pred_valid = out
        b, c1, s, _ = pred_pts.shape
        targ_seg, targ_pts, targ_valid = y
        out_flat = (pred_seg, pred_pts.reshape(b * c1, s, 3),
                    pred_valid.reshape(b * c1, s))
        y_flat = (targ_seg, targ_pts.reshape(b * c1, -1, 3),
                  targ_valid.reshape(b * c1, -1))
        total_on, comps_on = base_loss(out_flat, y_flat,
                                       current_epoch_fraction=1.0)
        total_off, _ = base_loss(out_flat, y_flat,
                                 current_epoch_fraction=0.0)
        # epoch_start fraction default 0.1 (dpsr_loss.py:29)
        use_mesh = frac >= 0.1
        total = jnp.where(use_mesh, total_on, total_off)
        comps = {"Segmentation": comps_on["Segmentation"],
                 "Chamfer": jnp.where(use_mesh, comps_on["Chamfer"], 0.0)}
        return total, comps

    # surface-triangle budget scales with the PSR grid's surface area
    # (reference uses a fixed 100k at 128^3; ~8*r^2 matches that)
    max_tris = max(2048, 8 * args.res[0] * args.res[1])
    common = dict(seg_net_class=args.model, k=args.k,
                  in_features=ds.n_features, num_classes=ds.num_classes,
                  spatial_transformer=args.transformer,
                  dynamic=not args.static,
                  image_feat_module=args.img_feat_extractor,
                  dpsr_res=tuple(args.res), dpsr_sigma=args.sigma,
                  max_tris=max_tris,
                  n_surface_samples=min(2048, 2 * args.pts))
    if getattr(args, "dpsr_version", 2) == 1:
        # v1: per-class extraction + estimated normals (dpsr_net.py:107-185)
        model = DPSRNet(**common)
    else:
        model = DPSRNet2(normals_smoothing_sigma=args.normals_sigma, **common)

    if not args.test_only:
        # op_count.csv artifact (reference train_dpsr_net.py via
        # thesis/utils.py); counts the FULL differentiable path incl. the
        # spectral PSR + marching tetrahedra at the configured resolution
        from fissure_segmentation_tpu.utils.profiling import param_and_op_count
        x0 = jnp.zeros((1, args.pts, ds.n_features), jnp.float32)
        rng0 = jax.random.PRNGKey(0)
        variables0 = model.init(rng0, x0, train=False, rng=rng0)
        counts = param_and_op_count(
            lambda v, x: model.apply(v, x, train=False, rng=rng0),
            (variables0, x0), variables=variables0["params"],
            out_dir=args.output)
        print(f"model: {counts['params']:,} params, "
              f"{counts['flops'] / 1e9:.2f} GFLOP / fwd batch-1")

    case_ids = [list(i) for i in ds.ids]
    split = load_split_file(args.split) if args.split else create_split(case_ids, k=5)
    save_split_file(split, os.path.join(args.output, "cross_val_split.json"))

    fold_metrics = []
    folds = range(len(split)) if args.fold is None else [args.fold]
    for fold in folds:
        print(f"------------ FOLD {fold} ----------------------")
        fold_dir = os.path.join(args.output, f"fold{fold}")
        train_ds, val_ds = ds.split_data_set(split[fold])

        if not args.test_only:
            point_store = train_ds.to_store()
            class_stores = [train_ds.class_mesh_store(l)
                            for l in range(1, ds.num_classes)]
            n_surf = model.n_surface_samples

            def batch_fn(rng, case_idx, train):
                r1, r2 = jax.random.split(rng)
                x, y = sample_batch(r1, point_store, case_idx, args.pts,
                                    augment=False, binary=train_ds.binary)
                surfs, valids = [], []
                for i, cs in enumerate(class_stores):
                    surf, _ = sample_mesh_batch(
                        jax.random.fold_in(r2, i), cs, case_idx, n_surf,
                        augment=False)
                    surfs.append(surf)
                    valids.append(jnp.ones(surf.shape[:-1], bool))
                surf = jnp.stack(surfs, axis=1)    # (B, C-1, n_surf, 3)
                valid = jnp.stack(valids, axis=1)  # (B, C-1, n_surf)
                return x, (y, surf, valid)

            cfg = TrainConfig(epochs=args.epochs, lr=args.lr,
                              batch_size=args.batch, weight_decay=args.wd,
                              scheduler=args.scheduler, seed=fold)
            trainer = ModelTrainer(
                model, train_ds, loss_fn, fold_dir, cfg, batch_fn=batch_fn,
                init_input=jnp.zeros((1, args.pts, ds.n_features), jnp.float32),
                epoch_in_loss=True)
            trainer.run()

        if not args.train_only:
            _, variables = load_model(os.path.join(fold_dir, "model.fst"))

            def seg_apply(v, x, train=False):
                out = model.apply(v, x, train=train)
                return out[0]  # seg logits only

            val_ds.do_augmentation = False
            fold_metrics.append(test_pipeline(
                val_ds, seg_apply, variables, os.path.join(fold_dir, "test"),
                sample_points=args.pts))

    if fold_metrics:
        from fissure_segmentation_tpu.train.cross_val import _write_cv_results
        _write_cv_results(os.path.join(args.output, "cv_results.csv"), fold_metrics)


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    parser = get_dpsr_train_parser()
    args = parser.parse_args()
    maybe_run_detached_cli(args)
    run(args)
