"""Training loop: Adam(+wd) with cosine/plateau/none schedulers, loss-component
history, best-model-by-val-loss snapshot.

TPU-first re-design of reference model_trainer.py:22-274:
  * the *whole epoch* (batch sampling, augmentation, forward/backward,
    optimizer update) is one jitted `lax.scan` over steps — data lives in a
    device-resident PointCloudStore, so the hot loop never touches the host;
  * torch-Adam-with-weight-decay == optax add_decayed_weights *before*
    scale_by_adam (not AdamW);
  * plateau scheduler (factor 0.8, patience/cooldown ceil(0.05*epochs),
    rel-threshold 1e-4, min_lr 0.05*lr — model_trainer.py:59-64) runs on host
    between epochs and writes the lr into the injected hyperparams;
  * inner 80/20 train/val split inside each fold (model_trainer.py:79-89),
    drop_last iff len(train)//2 >= batch_size;
  * history = batch-size-weighted epoch means (model_trainer.py:207-211);
  * best model (by val total loss, ties -> later epoch) kept on host and
    written at the end (model_trainer.py:229-251) together with
    train_time.csv and a training_progression.png.
"""
from __future__ import annotations

import csv
import dataclasses
import math
import os
import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import PointDataset
from ..data.store import sample_batch
from ..models.io import save_model


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 1000
    lr: float = 1e-3
    batch_size: int = 32
    weight_decay: float = 1e-5
    scheduler: str = "plateau"  # cosine | plateau | none
    val_split: float = 0.2
    seed: int = 0
    show_every: int = 50  # print frequency (epochs)


class _PlateauScheduler:
    """torch.optim.lr_scheduler.ReduceLROnPlateau, mode=min, rel threshold."""

    def __init__(self, lr, factor, patience, threshold, cooldown, min_lr):
        self.lr, self.factor, self.patience = lr, factor, patience
        self.threshold, self.cooldown, self.min_lr = threshold, cooldown, min_lr
        self.best = float("inf")
        self.num_bad = 0
        self.cooldown_counter = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad = 0
        return self.lr


class ModelTrainer:
    def __init__(self, model, ds: PointDataset, loss_fn: Callable, out_dir: str,
                 config: TrainConfig = TrainConfig(), initial_variables=None):
        self.model = model
        self.ds = ds
        self.loss_fn = loss_fn
        self.out_dir = out_dir
        self.cfg = config
        os.makedirs(out_dir, exist_ok=True)

        # inner 80/20 random train/val split of the fold's training set
        rng = np.random.default_rng(config.seed)
        n_val = int(len(ds) * config.val_split)
        perm = rng.permutation(len(ds))
        self.val_indices = perm[:n_val].tolist()
        self.train_indices = perm[n_val:].tolist()
        self.train_store = ds.to_store(self.train_indices)
        self.val_store = ds.to_store(self.val_indices) if n_val else None

        n_train = len(self.train_indices)
        self.drop_last = n_train // 2 >= config.batch_size
        if self.drop_last:
            self.steps_per_epoch = n_train // config.batch_size
        else:
            self.steps_per_epoch = max(1, -(-n_train // config.batch_size))

        # optimizer: torch-Adam + L2 into grads
        self.min_lr = config.lr * 0.05
        self.tx = optax.inject_hyperparams(self._make_opt)(learning_rate=config.lr)
        if config.scheduler == "plateau":
            self.scheduler = _PlateauScheduler(
                config.lr, factor=0.8,
                patience=math.ceil(0.05 * config.epochs),
                threshold=1e-4, cooldown=math.ceil(0.05 * config.epochs),
                min_lr=self.min_lr)
        elif config.scheduler == "cosine":
            self.scheduler = None  # closed form, see _cosine_lr
        elif config.scheduler == "none":
            self.scheduler = None
        else:
            raise ValueError(f'Scheduler "{config.scheduler}" undefined.')

        # init model + optimizer state
        k_init = jax.random.PRNGKey(config.seed)
        x0 = jnp.zeros((1, ds.sample_points, ds.n_features), jnp.float32)
        variables = initial_variables or self.model.init(k_init, x0, train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)

        self.training_history: dict[str, list] = {}
        self.validation_history: dict[str, list] = {}
        self.best_epoch = 0
        self.best_val = float("inf")
        self.best_snapshot = None

        self._epoch_fn = jax.jit(self._epoch, donate_argnums=(0, 1, 2))
        self._val_fn = jax.jit(self._validate)

    def _make_opt(self, learning_rate):
        return optax.chain(
            optax.add_decayed_weights(self.cfg.weight_decay),
            optax.adam(learning_rate),
        )

    def _cosine_lr(self, epoch: int) -> float:
        cfg = self.cfg
        return self.min_lr + (cfg.lr - self.min_lr) * \
            (1 + math.cos(math.pi * epoch / cfg.epochs)) / 2

    # ---- jitted epoch over the train store ----
    def _loss_and_out(self, params, batch_stats, x, y, train):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            logits, mutated = self.model.apply(variables, x, train=True,
                                               mutable=["batch_stats"])
            new_bs = mutated["batch_stats"]
        else:
            logits = self.model.apply(variables, x, train=False)
            new_bs = batch_stats
        loss, comps = self.loss_fn(logits, y)
        return loss, (comps, new_bs)

    def _epoch(self, params, batch_stats, opt_state, case_perm, rng):
        """case_perm: (steps, batch) indices into the train store."""

        def step(carry, inp):
            params, batch_stats, opt_state = carry
            idx, r = inp
            x, y = sample_batch(r, self.train_store, idx, self.ds.sample_points,
                                augment=self.ds.do_augmentation,
                                binary=self.ds.binary)
            (loss, (comps, new_bs)), grads = jax.value_and_grad(
                self._loss_and_out, has_aux=True)(params, batch_stats, x, y, True)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state), (loss, comps)

        rngs = jax.random.split(rng, case_perm.shape[0])
        (params, batch_stats, opt_state), (losses, comps) = jax.lax.scan(
            step, (params, batch_stats, opt_state), (case_perm, rngs))
        return params, batch_stats, opt_state, losses, comps

    def _validate(self, params, batch_stats, case_idx, rng):
        x, y = sample_batch(rng, self.val_store, case_idx, self.ds.sample_points,
                            augment=False, binary=self.ds.binary)
        loss, (comps, _) = self._loss_and_out(params, batch_stats, x, y, False)
        return loss, comps

    # ---- host-side epoch orchestration ----
    def _make_perm(self, rng: np.random.Generator) -> np.ndarray:
        n = len(self.train_indices)
        b, s = self.cfg.batch_size, self.steps_per_epoch
        perm = rng.permutation(n)
        need = s * b
        if need > n:  # wrap (pad the last partial batch with re-draws)
            perm = np.concatenate([perm, rng.permutation(n)[: need - n]])
        return perm[:need].reshape(s, b)

    def _record(self, history, values: dict, epoch):
        for k, v in values.items():
            history.setdefault(k, [0.0] * self.cfg.epochs)
            history[k][epoch] = float(v)

    def run(self, initial_epoch: int = 0):
        cfg = self.cfg
        rng_np = np.random.default_rng(cfg.seed + 1)
        key = jax.random.PRNGKey(cfg.seed + 2)
        training_start = time.time()
        params, batch_stats, opt_state = self.params, self.batch_stats, self.opt_state

        for epoch in range(initial_epoch, cfg.epochs):
            epoch_start = time.time()
            if cfg.scheduler == "cosine":
                opt_state.hyperparams["learning_rate"] = self._cosine_lr(epoch)
            key, k_ep, k_val = jax.random.split(key, 3)
            perm = jnp.asarray(self._make_perm(rng_np))
            params, batch_stats, opt_state, losses, comps = self._epoch_fn(
                params, batch_stats, opt_state, perm, k_ep)
            train_vals = {"total_loss": jnp.mean(losses),
                          **{k: jnp.mean(v) for k, v in comps.items()}}
            self._record(self.training_history, train_vals, epoch)

            if self.val_store is not None:
                vloss, vcomps = self._val_fn(params, batch_stats,
                                             jnp.arange(self.val_store.n_cases), k_val)
                val_vals = {"total_loss": vloss, **vcomps}
            else:
                val_vals = train_vals
            self._record(self.validation_history, val_vals, epoch)
            val_total = float(val_vals["total_loss"])

            if cfg.scheduler == "plateau":
                opt_state.hyperparams["learning_rate"] = self.scheduler.step(val_total)

            if val_total <= self.best_val:
                self.best_val = val_total
                self.best_epoch = epoch
                self.best_snapshot = jax.device_get({"params": params,
                                                     "batch_stats": batch_stats})

            if epoch % cfg.show_every == 0 or epoch == cfg.epochs - 1:
                print(f"EPOCH {epoch} ({time.time() - epoch_start:.3f}s) "
                      f"train {float(train_vals['total_loss']):.4f} "
                      f"val {val_total:.4f}")

        self.params, self.batch_stats, self.opt_state = params, batch_stats, opt_state
        self._finalize(time.time() - training_start)
        return {"params": self.params, "batch_stats": self.batch_stats}

    def _finalize(self, total_train_time_s: float):
        with open(os.path.join(self.out_dir, "train_time.csv"), "w") as f:
            w = csv.writer(f)
            w.writerow(["train time [m]"])
            w.writerow([str(total_train_time_s / 60)])

        if self.best_snapshot is not None:
            self.params = self.best_snapshot["params"]
            self.batch_stats = self.best_snapshot["batch_stats"]
        save_model(self.model,
                   {"params": self.params, "batch_stats": self.batch_stats},
                   os.path.join(self.out_dir, "model.fst"))
        self._save_history()
        self._plot_progression()

    def _save_history(self):
        path = os.path.join(self.out_dir, "history.csv")
        keys = sorted(self.training_history)
        with open(path, "w") as f:
            w = csv.writer(f)
            w.writerow([f"train_{k}" for k in keys] + [f"val_{k}" for k in keys])
            for ep in range(self.cfg.epochs):
                w.writerow([self.training_history[k][ep] for k in keys]
                           + [self.validation_history[k][ep] for k in keys])

    def _plot_progression(self):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return
        fig, ax = plt.subplots(figsize=(8, 5))
        ax.plot(self.training_history["total_loss"], label="train")
        ax.plot(self.validation_history["total_loss"], label="valid")
        ax.axvline(self.best_epoch, color="g", ls="--", label=f"best ({self.best_epoch})")
        ax.set_xlabel("epoch"); ax.set_ylabel("loss"); ax.legend()
        fig.savefig(os.path.join(self.out_dir, "training_progression.png"), dpi=100)
        plt.close(fig)
