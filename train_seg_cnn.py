"""Train the 3-D segmentation CNNs (MobileNet+ASPP v1 / LR-ASPP v3) used for
'cnn'-mode keypoint extraction.

Counterpart of reference train_segmentation_net.py: cross-validated voxel
CNN training on ImageDataset, sliding-window Gaussian-blended full-volume
inference (models/seg_cnn.py:22-99), per-fold Dice evaluation.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.cli import (get_seg_cnn_train_parser,
                                          load_args_for_testing, store_args)
from fissure_segmentation_tpu.data import (ImageDataset, create_split,
                                           load_split_file,
                                           make_synthetic_image_case,
                                           save_split_file)
from fissure_segmentation_tpu.losses import get_loss_fn
from fissure_segmentation_tpu.metrics import batch_dice
from fissure_segmentation_tpu.models import load_model, predict_all_patches
from fissure_segmentation_tpu.models.access_models import get_seg_cnn_model_class
from fissure_segmentation_tpu.train import TrainConfig
from fissure_segmentation_tpu.train.image_trainer import ImageTrainer
from fissure_segmentation_tpu.utils.detached_run import maybe_run_detached_cli


def build_dataset(args) -> ImageDataset:
    ps = (args.patch_size,) * 3
    if args.ds == "synthetic" or getattr(args, "data_dir", None) is None:
        cases = [make_synthetic_image_case(i, shape=(64, 64, 64))
                 for i in range(8)]
        return ImageDataset([c["image"] for c in cases],
                            [c["labels"] for c in cases],
                            [(c["case_id"], c["sequence"]) for c in cases],
                            resample_spacing=args.spacing, patch_size=ps,
                            exclude_rhf=args.exclude_rhf, binary=args.binary)
    return ImageDataset.from_folder(args.data_dir, copd=args.copd,
                                    resample_spacing=args.spacing,
                                    patch_size=ps, exclude_rhf=args.exclude_rhf,
                                    binary=args.binary)


def test_cnn(ds: ImageDataset, model, variables, out_dir: str) -> dict:
    """Full-volume sliding-window inference + Dice (train_segmentation_net.py
    test path)."""
    os.makedirs(out_dir, exist_ok=True)
    dices = []
    for i in range(len(ds)):
        img, lbl = ds[i]
        soft = predict_all_patches(model.apply, variables, jnp.asarray(img),
                                   ds.num_classes, patch_size=ds.patch_size)
        pred = jnp.argmax(soft, -1)
        d = batch_dice(pred.reshape(1, -1), jnp.asarray(lbl).reshape(1, -1),
                       ds.num_classes)
        dices.append(np.asarray(d))
    dices = np.stack(dices)  # (cases, classes)
    mean = dices.mean(0)
    with open(os.path.join(out_dir, "test_dice.csv"), "w") as f:
        f.write(",".join(f"class{c}" for c in range(ds.num_classes)) + "\n")
        f.write(",".join(str(v) for v in mean) + "\n")
    print("mean dice per class:", mean)
    return {"dice": float(mean[1:].mean())}


def run(args):
    os.makedirs(args.output, exist_ok=True)
    if args.test_only:
        args = load_args_for_testing(args.output, args)
    else:
        store_args(args, args.output)

    ds = build_dataset(args)
    cls = get_seg_cnn_model_class(args.model)
    model = cls(num_classes=ds.num_classes, patch_size=(args.patch_size,) * 3)
    loss_fn = get_loss_fn(args.loss, jnp.asarray(ds.get_class_weights()))

    if not args.test_only:
        # op_count.csv artifact (reference train_segmentation_net.py:217-229,
        # incl. the patch-wrapper FLOPs: counted at one full patch)
        from fissure_segmentation_tpu.utils.profiling import param_and_op_count
        x0 = jnp.zeros((1, *model.patch_size, 1), jnp.float32)
        variables0 = model.init(jax.random.PRNGKey(0), x0, train=False)
        counts = param_and_op_count(
            lambda v, x: model.apply(v, x, train=False), (variables0, x0),
            variables=variables0["params"], out_dir=args.output)
        print(f"model: {counts['params']:,} params, "
              f"{counts['flops'] / 1e9:.2f} GFLOP / patch")

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
            cfg = TrainConfig(epochs=args.epochs, lr=args.lr,
                              batch_size=args.batch, weight_decay=args.wd,
                              scheduler=args.scheduler, seed=fold)
            ImageTrainer(model, train_ds, loss_fn, fold_dir, cfg).run()

        if not args.train_only:
            _, variables = load_model(os.path.join(fold_dir, "model.fst"))
            fold_metrics.append(test_cnn(val_ds, model, variables,
                                         os.path.join(fold_dir, "test")))

    if fold_metrics:
        with open(os.path.join(args.output, "cv_results.csv"), "w") as f:
            f.write("fold,dice\n")
            for i, m in enumerate(fold_metrics):
                f.write(f"{i},{m['dice']}\n")
            f.write(f"mean,{np.mean([m['dice'] for m in fold_metrics])}\n")


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    parser = get_seg_cnn_train_parser()
    args = parser.parse_args()
    maybe_run_detached_cli(args)
    run(args)
