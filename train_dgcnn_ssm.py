"""Train DG-SSM: a multi-head DGCNN regressing statistical-shape-model
coefficients + similarity transform from keypoint clouds.

Counterpart of reference train_dgcnn_ssm.py + train.py's
CorrespondingPointDataset branch (train.py:40-67): per fold, fit the SSM by
PCA on the train split's corresponding-point data matrix
(dg_ssm.py:140-148), train the regressor with the DGSSM loss (Chamfer +
coefficient MSE + affine MSE), apply the head activation schedule
(model_trainer.py:115-120), and evaluate per-fissure corresponding-point
distance via ensembled full-cloud prediction (train_dgcnn_ssm.py:23-128).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.cli import (get_dgcnn_ssm_train_parser,
                                          load_args_for_testing, store_args)
from fissure_segmentation_tpu.data import (CorrespondingPointDataset,
                                           create_split, load_split_file,
                                           make_synthetic_dataset,
                                           save_split_file)
from fissure_segmentation_tpu.losses import get_loss_fn
from fissure_segmentation_tpu.losses.dgssm import corresponding_point_distance
from fissure_segmentation_tpu.models import DGSSM, load_model
from fissure_segmentation_tpu.models.dg_ssm import dgssm_ensemble_predict
from fissure_segmentation_tpu.shape_model import fit_ssm, load_ssm, save_ssm
from fissure_segmentation_tpu.train import ModelTrainer, TrainConfig
from fissure_segmentation_tpu.utils.detached_run import maybe_run_detached_cli


def build_dataset(args) -> CorrespondingPointDataset:
    if args.ds == "synthetic" or args.data_dir is None:
        # synthetic corresponding points: consistent surface parameterization
        # across cases = dense fissure grid samples (same (u,v) per case)
        from fissure_segmentation_tpu.data.synthetic import (_FISSURES,
                                                             _LUNGS, _surface_z)
        cases = make_synthetic_dataset(12, n_points=3000, with_feature=False)
        p_per_f = 256
        corr, labels = [], []
        for c in cases:
            pts, lbl = [], []
            for f, (lung, _, _) in _FISSURES.items():
                if f == 3 and args.exclude_rhf:
                    continue
                cen, ax = _LUNGS[lung]
                u = np.linspace(-0.55, 0.55, 16)
                v = np.linspace(-0.55, 0.55, 16)
                uu, vv = np.meshgrid(u, v)
                x = cen[0] + uu.ravel() * ax[0]
                y = cen[1] + vv.ravel() * ax[1]
                z = _surface_z(c["surface_params"][f], x, y, cen[0])
                d, h, w = c["shape"]
                scale = np.array([w, h, d], np.float32) - 1
                pts.append(np.stack([x, y, z], -1).astype(np.float32) * scale)
                lbl.append(np.full(len(x), f, np.int32))
            corr.append(np.concatenate(pts))
            labels.append(np.concatenate(lbl))
        prereg = [{"rotation": np.eye(3, dtype=np.float32),
                   "translation": np.zeros(3, np.float32), "scale": 1.0}
                  for _ in cases]
        return CorrespondingPointDataset(cases, np.stack(corr), prereg,
                                         corr_labels=labels[0],
                                         sample_points=args.pts,
                                         do_augmentation=True)
    raise NotImplementedError(
        "real-data DG-SSM needs corresponding points from "
        "shape_model.generate_corresponding_points")


def run(args):
    os.makedirs(args.output, exist_ok=True)
    if args.test_only:
        args = load_args_for_testing(args.output, args)
    else:
        store_args(args, args.output)

    ds = build_dataset(args)
    base_loss = get_loss_fn("ssm", term_weights=args.loss_weights)

    case_ids = [list(i) for i in ds.ids]
    split = load_split_file(args.split) if args.split else create_split(case_ids, k=5)
    save_split_file(split, os.path.join(args.output, "cross_val_split.json"))

    fold_metrics = []
    folds = range(len(split)) if args.fold is None else [args.fold]
    for fold in folds:
        print(f"------------ FOLD {fold} ----------------------")
        fold_dir = os.path.join(args.output, f"fold{fold}")
        os.makedirs(fold_dir, exist_ok=True)
        train_ds, val_ds = ds.split_data_set(split[fold])

        ssm_path = os.path.join(fold_dir, "ssm.npz")
        if not args.test_only:
            # one-shot PCA fit before SGD (train.py:49-53, ssm.py:35-60)
            shapes = train_ds.get_normalized_corr_datamatrix_with_affine_reg()
            if args.lssm:
                from fissure_segmentation_tpu.shape_model import fit_lssm
                ssm = fit_lssm(shapes, alpha=args.alpha,
                               target_variance=args.target_variance)
            else:
                ssm = fit_ssm(shapes, alpha=args.alpha,
                              target_variance=args.target_variance)
            save_ssm(ssm, ssm_path)
        else:
            ssm = load_ssm(ssm_path)
        print(f"SSM: {ssm.eigenvalues.shape[-1]} modes")

        model = DGSSM(k=args.k, in_features=3,
                      ssm_modes=int(ssm.eigenvalues.shape[-1]),
                      dynamic=not args.static,
                      predict_affine_params=args.predict_affine,
                      only_affine=args.only_affine,
                      active_heads=("main", "translation", "rotation", "scaling"))

        if not args.test_only and fold == list(folds)[0]:
            # op_count.csv artifact (reference train_dgcnn_ssm.py via
            # thesis/utils.py); the mode count is SSM-fit-dependent so it is
            # written once, for the first trained fold
            from fissure_segmentation_tpu.utils.profiling import \
                param_and_op_count
            x0 = jnp.zeros((1, args.pts, 3), jnp.float32)
            variables0 = model.init(jax.random.PRNGKey(0), x0, ssm,
                                    train=False)
            counts = param_and_op_count(
                lambda v, x: model.apply(v, x, ssm, train=False),
                (variables0, x0), variables=variables0["params"],
                out_dir=args.output)
            print(f"model: {counts['params']:,} params, "
                  f"{counts['flops'] / 1e9:.2f} GFLOP / fwd batch-1")

        # target SSM weights are computed on-the-fly from the target shape
        # (reference model_trainer.py:164-169)
        def loss_fn(out, y):
            from fissure_segmentation_tpu.shape_model import ssm_project
            t_corr, t_params = y
            t_weights = ssm_project(ssm, t_corr)
            return base_loss(out, (t_corr, t_weights, t_params))

        if not args.test_only:
            store = train_ds.to_store()
            corr_pts, corr_params = train_ds.corr_targets()
            corr_pts, corr_params = jnp.asarray(corr_pts), jnp.asarray(corr_params)

            def batch_fn(rng, case_idx, train):
                aug = train_ds.augment_correspondingly
                train_ds.augment_correspondingly = train and aug
                out = train_ds.sample_batch(rng, store, case_idx,
                                            corr_pts, corr_params)
                train_ds.augment_correspondingly = aug
                return out

            def forward_fn(variables, x, train):
                if train:
                    out, mut = trainer.model.apply(variables, x, ssm, train=True,
                                                   mutable=["batch_stats"])
                    return out, mut["batch_stats"]
                return trainer.model.apply(variables, x, ssm, train=False), \
                    variables.get("batch_stats", {})

            def init_fn(rng, x):
                return model.init(rng, x, ssm, train=False)

            schedule = args.head_schedule or {}

            def epoch_callback(tr, epoch):
                active = tuple(name for name in
                               ("main", "translation", "rotation", "scaling")
                               if epoch >= schedule.get(name, 0))
                if active != tr.model.active_heads:
                    print(f"epoch {epoch}: active heads {active}")
                    from fissure_segmentation_tpu.models.io import _module_config
                    cfg_dict = _module_config(tr.model)
                    cfg_dict["active_heads"] = active
                    tr.model = type(tr.model)(**{
                        k: tuple(v) if isinstance(v, list) else v
                        for k, v in cfg_dict.items()})
                    return True
                return False

            cfg = TrainConfig(epochs=args.epochs, lr=args.lr,
                              batch_size=args.batch, weight_decay=args.wd,
                              scheduler=args.scheduler, seed=fold)
            trainer = ModelTrainer(
                model, train_ds, loss_fn, fold_dir, cfg, batch_fn=batch_fn,
                forward_fn=forward_fn, init_fn=init_fn,
                init_input=jnp.zeros((1, args.pts, 3), jnp.float32),
                epoch_callback=epoch_callback)
            trainer.run()

        if not args.train_only:
            _, variables = load_model(os.path.join(fold_dir, "model.fst"))
            fold_metrics.append(test_dgssm(val_ds, model, variables, ssm,
                                           os.path.join(fold_dir, "test"),
                                           sample_points=args.pts))

    if fold_metrics:
        with open(os.path.join(args.output, "cv_results.csv"), "w") as f:
            f.write("fold,corr_point_dist\n")
            for i, m in enumerate(fold_metrics):
                f.write(f"{i},{m['corr_dist']}\n")
            f.write(f"mean,{np.mean([m['corr_dist'] for m in fold_metrics])}\n")


def test_dgssm(val_ds: CorrespondingPointDataset, model: DGSSM, variables,
               ssm, out_dir: str, sample_points: int, n_runs: int = 20):
    """Ensembled full-cloud prediction -> decoded shape vs target
    corresponding points (train_dgcnn_ssm.py:23-128)."""
    os.makedirs(out_dir, exist_ok=True)
    corr_pts, _ = val_ds.corr_targets()
    dists = []
    for i in range(len(val_ds)):
        x, _ = val_ds.get_full_pointcloud(i)
        recon, _, _ = dgssm_ensemble_predict(
            model.apply, variables, ssm, jnp.asarray(x)[None],
            jax.random.PRNGKey(i), sample_points=sample_points,
            n_runs_min=n_runs)
        d = corresponding_point_distance(recon[0], jnp.asarray(corr_pts[i]))
        dists.append(float(jnp.mean(d)))
    mean = float(np.mean(dists))
    with open(os.path.join(out_dir, "corr_point_distance.csv"), "w") as f:
        f.write("mean,std\n")
        f.write(f"{mean},{np.std(dists)}\n")
    print(f"corresponding point distance: {mean:.4f} +- {np.std(dists):.4f}")
    return {"corr_dist": mean}


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    parser = get_dgcnn_ssm_train_parser()
    args = parser.parse_args()
    maybe_run_detached_cli(args)
    run(args)
