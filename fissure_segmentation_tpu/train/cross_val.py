"""k-fold cross-validation harness (reference train.py:486-565 `cross_val`).

Per fold: split the dataset, call a user `train_fn` (fresh model state per
fold — ModelTrainer re-inits from its seed) and a `test_fn`, then aggregate
per-fold metric dicts into cv_results.csv. The callback form is expressive
enough for every entry script (custom batch_fn, device mesh, per-fold SSM
fitting, COPD transfer validation where `train_ds is None`).
"""
from __future__ import annotations

import csv
import os
from typing import Callable, Iterable

import numpy as np

from ..data.dataset import PointDataset, save_split_file


def cross_val_training(ds: PointDataset, split: list[dict], out_dir: str,
                       train_fn: Callable | None,
                       test_fn: Callable | None = None,
                       test_only: bool = False, train_only: bool = False,
                       folds: Iterable[int] | None = None,
                       results_suffix: str = ""):
    """Run k-fold CV.

    :param train_fn: ``train_fn(train_ds, fold_dir, fold)`` — trains and
        saves the fold's model. Skipped when `test_only` or when the split
        yields no training set (COPD transfer validation).
    :param test_fn: ``test_fn(val_ds, fold_dir, fold)`` — returns a dict of
        per-class metric arrays (e.g. {'dice': (C,), 'assd': (F,)});
        mean/std across folds are written to ``cv_results{suffix}.csv``.
    :param folds: subset of fold indices to run (default: all).
    """
    os.makedirs(out_dir, exist_ok=True)
    split_path = os.path.join(out_dir, "cross_val_split.json")
    # Record the training split once. Never clobber an existing record: a
    # --test_only / COPD transfer rerun passes a *different* (possibly
    # freshly generated) split, and overwriting would destroy the
    # provenance of which cases each fold's model was trained on.
    if not (test_only and os.path.exists(split_path)):
        save_split_file(split, split_path)
    fold_metrics: list[dict] = []

    for fold in (range(len(split)) if folds is None else folds):
        print(f"------------ FOLD {fold} ----------------------")
        fold_dir = os.path.join(out_dir, f"fold{fold}")
        train_ds, val_ds = ds.split_data_set(split[fold], fold_nr=fold)

        if train_fn is not None and not test_only and train_ds is not None:
            train_fn(train_ds, fold_dir, fold)

        if test_fn is not None and not train_only:
            fold_metrics.append(test_fn(val_ds, fold_dir, fold))

    if fold_metrics:
        write_cv_results(
            os.path.join(out_dir, f"cv_results{results_suffix}.csv"),
            fold_metrics)
    return fold_metrics


def write_cv_results(path: str, fold_metrics: list[dict]) -> None:
    keys = sorted(fold_metrics[0])
    with open(path, "w") as f:
        w = csv.writer(f)
        for k in keys:
            vals = np.stack([np.asarray(m[k], dtype=np.float64) for m in fold_metrics])
            w.writerow([f"mean_{k}"] + list(np.atleast_1d(vals.mean(0))))
            w.writerow([f"std_{k}"] + list(np.atleast_1d(vals.std(0))))
    print(f"wrote {path}")


_write_cv_results = write_cv_results  # back-compat alias
