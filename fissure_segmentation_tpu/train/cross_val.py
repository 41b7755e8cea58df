"""k-fold cross-validation harness (reference train.py:486-565 `cross_val`).

Per fold: fresh model init, ModelTrainer on the fold's training cases
(which internally re-splits 80/20 train/val), optional test function on the
fold's held-out cases; aggregates per-fold metrics into cv_results.csv.
"""
from __future__ import annotations

import csv
import os
from typing import Callable

import jax
import numpy as np

from ..data.dataset import PointDataset, save_split_file
from .trainer import ModelTrainer, TrainConfig


def cross_val_training(model, ds: PointDataset, split: list[dict], out_dir: str,
                       loss_fn: Callable, config: TrainConfig = TrainConfig(),
                       test_fn: Callable | None = None,
                       test_only: bool = False, train_only: bool = False):
    """Run k-fold CV. `test_fn(val_ds, fold_dir)` returns a dict of per-class
    metric arrays (e.g. {'dice': (C,), 'assd': (F,)}); aggregated mean/std
    across folds are written to cv_results.csv.
    """
    os.makedirs(out_dir, exist_ok=True)
    save_split_file(split, os.path.join(out_dir, "cross_val_split.json"))
    fold_metrics: list[dict] = []

    for fold, tr_val in enumerate(split):
        print(f"------------ FOLD {fold} ----------------------")
        fold_dir = os.path.join(out_dir, f"fold{fold}")
        train_ds, val_ds = ds.split_data_set(tr_val, fold_nr=fold)

        if not test_only:
            cfg = TrainConfig(**{**config.__dict__, "seed": config.seed + fold})
            trainer = ModelTrainer(model, train_ds, loss_fn, fold_dir, cfg)
            trainer.run()

        if test_fn is not None and not train_only:
            fold_metrics.append(test_fn(val_ds, fold_dir))

    if fold_metrics:
        _write_cv_results(os.path.join(out_dir, "cv_results.csv"), fold_metrics)
    return fold_metrics


def _write_cv_results(path: str, fold_metrics: list[dict]) -> None:
    keys = sorted(fold_metrics[0])
    with open(path, "w") as f:
        w = csv.writer(f)
        for k in keys:
            vals = np.stack([np.asarray(m[k], dtype=np.float64) for m in fold_metrics])
            w.writerow([f"mean_{k}"] + list(np.atleast_1d(vals.mean(0))))
            w.writerow([f"std_{k}"] + list(np.atleast_1d(vals.std(0))))
    print(f"wrote {path}")
