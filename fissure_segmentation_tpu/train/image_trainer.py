"""Trainer for the voxel-CNN path (heterogeneous full volumes).

Unlike the point-cloud trainer (trainer.py — whole epoch in one lax.scan over
a device-resident store), CT volumes have per-case shapes, so patch *cropping*
happens on host per step (data/image_dataset.py:random_patch_crop) while the
augmentation + forward/backward run in a single jitted train step.

Counterpart of the reference's ModelTrainer when driven by ImageDataset
(model_trainer.py:22-274 + train_segmentation_net.py): same Adam(+wd),
schedulers, best-model snapshot, history CSV outputs.
"""
from __future__ import annotations

import csv
import math
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.image_dataset import (ImageDataset, augment_image_batch,
                                  random_patch_crop)
from ..models.io import save_model
from .trainer import TrainConfig, _PlateauScheduler


class ImageTrainer:
    def __init__(self, model, ds: ImageDataset, loss_fn, out_dir: str,
                 config: TrainConfig = TrainConfig()):
        self.model, self.ds, self.loss_fn = model, ds, loss_fn
        self.out_dir, self.cfg = out_dir, config
        os.makedirs(out_dir, exist_ok=True)

        rng = np.random.default_rng(config.seed)
        n_val = int(len(ds) * config.val_split)
        perm = rng.permutation(len(ds))
        self.val_indices = perm[:n_val].tolist()
        self.train_indices = perm[n_val:].tolist()
        self.steps_per_epoch = max(1, len(self.train_indices) // max(config.batch_size, 1))

        self.min_lr = config.lr * 0.05
        self.tx = optax.inject_hyperparams(self._make_opt)(learning_rate=config.lr)
        self.scheduler = _PlateauScheduler(
            config.lr, 0.8, math.ceil(0.05 * config.epochs), 1e-4,
            math.ceil(0.05 * config.epochs), self.min_lr) \
            if config.scheduler == "plateau" else None

        x0 = jnp.zeros((1, *ds.patch_size, 1), jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(config.seed), x0,
                                    train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)
        self.training_history: dict[str, list] = {}
        self.validation_history: dict[str, list] = {}
        self.best_epoch, self.best_val, self.best_snapshot = 0, float("inf"), None

        self._step = jax.jit(self._train_step, donate_argnums=(0, 1, 2))
        self._val_step = jax.jit(self._eval_step)

    def _make_opt(self, learning_rate):
        return optax.chain(optax.add_decayed_weights(self.cfg.weight_decay),
                           optax.adam(learning_rate))

    def _loss(self, params, batch_stats, imgs, lbls, train, rng=None):
        variables = {"params": params, "batch_stats": batch_stats}
        x = imgs[..., None]
        if train:
            logits, mut = self.model.apply(variables, x, train=True,
                                           mutable=["batch_stats"],
                                           rngs=None if rng is None
                                           else {"dropout": rng})
            new_bs = mut["batch_stats"]
        else:
            logits = self.model.apply(variables, x, train=False)
            new_bs = batch_stats
        # loss over flattened voxels: (B, V, C) logits vs (B, V) labels
        b = logits.shape[0]
        loss, comps = self.loss_fn(
            logits.reshape(b, -1, logits.shape[-1]), lbls.reshape(b, -1))
        return loss, (comps, new_bs)

    def _train_step(self, params, batch_stats, opt_state, rng, imgs, lbls):
        r_aug, r_drop = jax.random.split(rng)
        if self.ds.do_augmentation:
            imgs, lbls = augment_image_batch(r_aug, imgs, lbls)
        (loss, (comps, new_bs)), grads = jax.value_and_grad(
            self._loss, has_aux=True)(params, batch_stats, imgs, lbls, True,
                                      r_drop)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss, comps

    def _eval_step(self, params, batch_stats, imgs, lbls):
        loss, (comps, _) = self._loss(params, batch_stats, imgs, lbls, False)
        return loss, comps

    def _record(self, history, values, epoch):
        for k, v in values.items():
            history.setdefault(k, [0.0] * self.cfg.epochs)
            history[k][epoch] = float(v)

    def run(self, initial_epoch: int = 0):
        cfg = self.cfg
        rng_np = np.random.default_rng(cfg.seed + 1)
        key = jax.random.PRNGKey(cfg.seed + 2)
        start = time.time()
        params, batch_stats, opt_state = self.params, self.batch_stats, self.opt_state

        for epoch in range(initial_epoch, cfg.epochs):
            t0 = time.time()
            if cfg.scheduler == "cosine":
                opt_state.hyperparams["learning_rate"] = self.min_lr + \
                    (cfg.lr - self.min_lr) * (1 + math.cos(math.pi * epoch / cfg.epochs)) / 2
            ep_losses, ep_comps = [], []
            order = rng_np.permutation(self.train_indices).tolist()
            for s in range(self.steps_per_epoch):
                batch_idx = [order[(s * cfg.batch_size + j) % len(order)]
                             for j in range(cfg.batch_size)]
                imgs, lbls = zip(*(
                    random_patch_crop(rng_np, self.ds.images[i],
                                      self.ds.labels[i], self.ds.patch_size)
                    for i in batch_idx))
                key, k = jax.random.split(key)
                params, batch_stats, opt_state, loss, comps = self._step(
                    params, batch_stats, opt_state, k,
                    jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(lbls)))
                ep_losses.append(float(loss))
                ep_comps.append({k2: float(v) for k2, v in comps.items()})
            train_vals = {"total_loss": np.mean(ep_losses),
                          **{k2: np.mean([c[k2] for c in ep_comps])
                             for k2 in ep_comps[0]}}
            self._record(self.training_history, train_vals, epoch)

            if self.val_indices:
                v_losses = []
                for i in self.val_indices:
                    img, lbl = random_patch_crop(
                        np.random.default_rng(cfg.seed + i),
                        self.ds.images[i], self.ds.labels[i], self.ds.patch_size)
                    loss, _ = self._val_step(params, batch_stats,
                                             jnp.asarray(img)[None],
                                             jnp.asarray(lbl)[None])
                    v_losses.append(float(loss))
                val_total = float(np.mean(v_losses))
            else:
                val_total = float(train_vals["total_loss"])
            self._record(self.validation_history, {"total_loss": val_total}, epoch)

            if cfg.scheduler == "plateau":
                opt_state.hyperparams["learning_rate"] = self.scheduler.step(val_total)
            if val_total <= self.best_val:
                self.best_val, self.best_epoch = val_total, epoch
                self.best_snapshot = jax.device_get(
                    {"params": params, "batch_stats": batch_stats})
            if epoch % cfg.show_every == 0 or epoch == cfg.epochs - 1:
                print(f"EPOCH {epoch} ({time.time() - t0:.3f}s) "
                      f"train {train_vals['total_loss']:.4f} val {val_total:.4f}")

        self.params, self.batch_stats, self.opt_state = params, batch_stats, opt_state
        self._finalize(time.time() - start)
        return {"params": self.params, "batch_stats": self.batch_stats}

    def _finalize(self, total_s: float):
        with open(os.path.join(self.out_dir, "train_time.csv"), "w") as f:
            w = csv.writer(f)
            w.writerow(["train time [m]"])
            w.writerow([str(total_s / 60)])
        if self.best_snapshot is not None:
            self.params = self.best_snapshot["params"]
            self.batch_stats = self.best_snapshot["batch_stats"]
        save_model(self.model,
                   {"params": self.params, "batch_stats": self.batch_stats},
                   os.path.join(self.out_dir, "model.fst"))
