"""Train/evaluate point-cloud fissure segmentation networks.

Counterpart of reference train.py (__main__:609-667, run:568, cross_val:486,
train:32, test:179, speed_test:349) + train_segmentation_net.py: cross-
validated training of DGCNN / PointNet / PointTransformer on keypoint-cloud
cases, full test pipeline (ensembled inference -> surface fitting -> Dice +
mesh metrics -> CSVs) and an inference speed test.

Data: --ds synthetic generates cases on the fly; --data_dir loads
*_points_*.npz case files (convertible from the reference's .pth files via
fissure_segmentation_tpu.data.dataset.load_reference_point_file).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.cli import (get_point_segmentation_parser,
                                          load_args_for_testing, store_args)
from fissure_segmentation_tpu.data import (PointDataset, create_split,
                                           load_split_file,
                                           make_synthetic_dataset)
from fissure_segmentation_tpu.losses import get_loss_fn
from fissure_segmentation_tpu.models import (get_point_seg_model_class,
                                             load_model)
from fissure_segmentation_tpu.train import ModelTrainer, TrainConfig
from fissure_segmentation_tpu.train.evaluation import (test_pipeline,
                                                       write_speed_results)
from fissure_segmentation_tpu.utils.detached_run import maybe_run_detached_cli


def build_dataset(args) -> PointDataset:
    copd = bool(getattr(args, "copd", False))
    kwargs = dict(sample_points=args.pts, exclude_rhf=args.exclude_rhf,
                  lobes=args.data == "lobes", binary=args.binary, copd=copd)
    if args.ds == "synthetic" or args.data_dir is None:
        if copd:
            # distinct synthetic cohort standing in for the COPD transfer-
            # validation data (reference data.py:486-498: a separate dataset
            # becomes the validation set of every fold)
            cases = make_synthetic_dataset(6, n_points=8000, gt_surfaces=True,
                                           seed=777)
            for i, c in enumerate(cases):
                c["case_id"] = f"COPD{i:02d}"
            return PointDataset(cases, **kwargs)
        cases = make_synthetic_dataset(20, n_points=8000, gt_surfaces=True)
        return PointDataset(cases, **kwargs)
    ds = PointDataset.from_folder(args.data_dir, **kwargs)
    _check_point_file_provenance(ds, args)
    return ds


def _check_point_file_provenance(ds: PointDataset, args) -> None:
    """A point-file folder holds ONE keypoint/feature combination (set at
    preprocess time, recorded in the npz meta). --kp_mode/--patch merely
    label the experiment — warn loudly when they contradict the data so a
    grid of runs can't silently train the same files under many names."""
    case = ds.cases[0] if ds.cases else {}
    for flag, key in (("kp_mode", "kp_mode"), ("patch", "feature_mode")):
        want = getattr(args, flag, None)
        have = case.get(key)
        if want and have is not None and want != have:
            print(f"WARNING: --{flag}={want} but {args.data_dir} was "
                  f"preprocessed with {key}={have}; the point files win — "
                  "re-run preprocess_dataset.py for this combination.")


def build_model(args, ds: PointDataset):
    cls = get_point_seg_model_class(args.model)
    kwargs = dict(in_features=ds.n_features, num_classes=ds.num_classes)
    if getattr(args, "amp", True) and args.model != "PointTransformer":
        # bf16 compute path = the reference's AMP autocast, which is enabled
        # for all point-seg losses (model_trainer.py:75,157). Excluded for
        # PointTransformer: its q-k cancellation compounds bf16 rounding
        # over ~50 layers (bf16 has 8 mantissa bits vs fp16-AMP's 11) —
        # pass dtype explicitly to opt in.
        kwargs.update(dtype=jnp.bfloat16)
    if args.model in ("DGCNN",):
        kwargs.update(k=args.k, spatial_transformer=args.transformer,
                      dynamic=not args.static,
                      image_feat_module=args.img_feat_extractor,
                      knn_recall=getattr(args, "knn_recall", None))
    elif args.model == "PointNet":
        kwargs.update(spatial_transform=args.transformer)
    return cls(**kwargs)


def speed_test(ds: PointDataset, model, variables, out_dir: str,
               sample_points: int, n_runs_min: int = 50, repeats: int = 10):
    """Inference timing (train.py:349-424): block_until_ready-timed ensemble
    prediction over full clouds."""
    import time
    from fissure_segmentation_tpu.models.ensemble import ensemble_predict

    x, _ = ds.get_full_pointcloud(0)
    x = jnp.asarray(x)
    rng = jax.random.PRNGKey(42)
    # warm-up / compile
    jax.block_until_ready(ensemble_predict(model.apply, variables, x, rng,
                                           sample_points, n_runs_min))
    times = []
    for i in range(repeats):
        rng, r = jax.random.split(rng)
        t0 = time.perf_counter()
        jax.block_until_ready(ensemble_predict(model.apply, variables, x, r,
                                               sample_points, n_runs_min))
        times.append(time.perf_counter() - t0)
    write_speed_results(out_dir, times)
    print(f"inference: {np.mean(times) * 1e3:.1f} +- {np.std(times) * 1e3:.1f} ms")


def run(args):
    os.makedirs(args.output, exist_ok=True)
    if args.test_only or args.copd or args.speed:
        # speed runs load the trained config too (reference cli_utils.py
        # keeps 'speed' in the override whitelist) — a plain store_args here
        # would clobber the trained run's commandline_args.json
        args = load_args_for_testing(args.output, args)
    else:
        store_args(args, args.output)
    if args.copd:
        # COPD = pure transfer validation of already-trained folds
        # (reference train.py:631-634)
        print("Validating with COPD dataset")
        args.test_only = True
        args.speed = False

    ds = build_dataset(args)
    model = build_model(args, ds)
    loss_fn = get_loss_fn(args.loss, jnp.asarray(ds.get_class_weights()))

    if not args.test_only and not args.copd and not args.speed:
        # op_count.csv artifact (reference train.py:661 via thesis/utils.py)
        from fissure_segmentation_tpu.utils.profiling import param_and_op_count
        pc, _ = ds.get_full_pointcloud(0)
        x0 = jnp.asarray(pc[:args.pts])[None]
        variables0 = model.init(jax.random.PRNGKey(0), x0, train=False)
        counts = param_and_op_count(
            lambda v, x: model.apply(v, x, train=False), (variables0, x0),
            variables=variables0["params"], out_dir=args.output)
        print(f"model: {counts['params']:,} params, "
              f"{counts['flops'] / 1e9:.2f} GFLOP / fwd batch-1")

    if args.split:
        split = load_split_file(args.split)
    else:
        split = create_split(ds.ids, k=5)

    cfg = TrainConfig(epochs=args.epochs, lr=args.lr, batch_size=args.batch,
                      weight_decay=args.wd, scheduler=args.scheduler)

    if args.speed:
        fold_dir = os.path.join(args.output, "fold0")
        model, variables = load_model(os.path.join(fold_dir, "model.fst"))
        speed_test(ds, model, variables, args.output, args.pts)
        return

    def train_fn(train_ds, fold_dir, fold):
        mesh = None
        if getattr(args, "dp", False) and len(jax.devices()) > 1:
            from fissure_segmentation_tpu.parallel import make_mesh
            mesh = make_mesh(("data",))
        vis_fn, vis_every = None, 1
        if getattr(args, "visualize", None):
            from fissure_segmentation_tpu.utils.visualization import \
                point_seg_visualization
            vis_fn, vis_every = point_seg_visualization, int(args.visualize)
        trainer = ModelTrainer(model, train_ds, loss_fn, fold_dir,
                               TrainConfig(**{**cfg.__dict__,
                                              "seed": cfg.seed + fold}),
                               visualization_fn=vis_fn,
                               visualize_every=vis_every,
                               mesh=mesh)
        trainer.run()

    def test_fn(val_ds, fold_dir, fold):
        _, variables = load_model(os.path.join(fold_dir, "model.fst"))
        val_ds.do_augmentation = False
        return test_pipeline(val_ds, model.apply, variables,
                             os.path.join(fold_dir, "test"),
                             sample_points=args.pts, copd=args.copd)

    from fissure_segmentation_tpu.train.cross_val import cross_val_training
    cross_val_training(
        ds, split, args.output, train_fn, test_fn,
        test_only=args.test_only, train_only=args.train_only,
        folds=None if args.fold is None else [args.fold],
        results_suffix="_copd" if args.copd else "")  # reference train.py:563


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    parser = get_point_segmentation_parser()
    args = parser.parse_args()
    maybe_run_detached_cli(args)
    run(args)
