"""Training loop: Adam(+wd) with cosine/plateau/none schedulers, loss-component
history, best-model-by-val-loss snapshot, optimizer-state checkpointing.

TPU-first re-design of reference model_trainer.py:22-274:
  * the *whole epoch* (batch sampling, augmentation, forward/backward,
    optimizer update) is one jitted `lax.scan` over steps — data lives in
    device-resident stores, so the hot loop never touches the host;
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

Family-generic hooks (the reference hard-codes these per entry script):
  * `batch_fn(rng, case_idx, train)` — override how batches are drawn
    (mesh sampling for the PC-AE, corresponding-point targets for DG-SSM,
    image patches for the CNNs); default samples the PointCloudStore.
  * `forward_fn(variables, x, train)` — override the model application
    (e.g. to close over frozen SSM parameters).
  * `epoch_in_loss` — losses that change with training progress take
    `epoch` as a traced argument (DPSR's gated mesh term, dpsr_loss.py:29).
  * `epoch_callback(trainer, epoch)` — host-side per-epoch hook; return
    True to rebuild the jitted epoch (DG-SSM head schedule,
    model_trainer.py:115-120).

Unlike the reference (no optimizer/scheduler state saved, no mid-run resume
— model_trainer.py:229-251), `checkpoint_every` writes full training state
(params, batch_stats, optimizer, histories) and `run(resume=True)` continues
from the latest checkpoint.
"""
from __future__ import annotations

import csv
import dataclasses
import math
import os
import pickle
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

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
    checkpoint_every: int | None = None  # epochs between resumable checkpoints


class _PlateauScheduler:
    """torch.optim.lr_scheduler.ReduceLROnPlateau, mode=min, rel threshold."""

    def __init__(self, lr, factor, patience, threshold, cooldown, min_lr):
        self.lr, self.factor, self.patience = lr, factor, patience
        self.threshold, self.cooldown, self.min_lr = threshold, cooldown, min_lr
        self.best = float("inf")
        self.num_bad = 0
        self.cooldown_counter = 0

    def step(self, metric: float) -> float:
        # exact torch ReduceLROnPlateau order: best/num_bad update first,
        # then cooldown ticks every epoch (resetting num_bad), then reduce
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad = 0
        return self.lr

    def state_dict(self):
        return dict(self.__dict__)

    def load_state_dict(self, d):
        self.__dict__.update(d)


class ModelTrainer:
    def __init__(self, model, ds, loss_fn: Callable, out_dir: str,
                 config: TrainConfig = TrainConfig(), initial_variables=None,
                 batch_fn: Callable | None = None,
                 forward_fn: Callable | None = None,
                 init_fn: Callable | None = None,
                 init_input=None, epoch_in_loss: bool = False,
                 epoch_callback: Callable | None = None,
                 visualization_fn: Callable | None = None,
                 visualize_every: int = 1,
                 mesh=None, mesh_axis: str = "data"):
        """`mesh`: optional jax.sharding.Mesh — trains data-parallel with
        the batch axis sharded over `mesh_axis` (params/optimizer state
        replicated, gradients reduced by GSPMD; SURVEY.md §2.5). The batch
        size must be divisible by the mesh axis size."""
        self.model = model
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        if mesh is not None and config.batch_size % mesh.shape[mesh_axis]:
            raise ValueError(
                f"batch_size {config.batch_size} not divisible by mesh axis "
                f"'{mesh_axis}' size {mesh.shape[mesh_axis]}")
        self.ds = ds
        self.loss_fn = loss_fn
        self.out_dir = out_dir
        self.cfg = config
        self.epoch_in_loss = epoch_in_loss
        self.epoch_callback = epoch_callback
        # per-epoch rendering hook (reference model_trainer.py:35-39,134-136):
        # called after validation as fn(x, y, output, epoch, out_dir) with
        # host numpy arrays of the validation batch
        self.visualization_fn = visualization_fn
        self.visualize_every = visualize_every
        os.makedirs(out_dir, exist_ok=True)

        # inner 80/20 random train/val split of the fold's training set
        rng = np.random.default_rng(config.seed)
        n_val = int(len(ds) * config.val_split)
        perm = rng.permutation(len(ds))
        self.val_indices = perm[:n_val].tolist()
        self.train_indices = perm[n_val:].tolist()

        if batch_fn is None:
            store = ds.to_store()

            def batch_fn(rng, case_idx, train):
                return sample_batch(rng, store, case_idx, ds.sample_points,
                                    augment=train and ds.do_augmentation,
                                    binary=ds.binary)
        self.batch_fn = batch_fn
        self.forward_fn = forward_fn

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
        elif config.scheduler in ("cosine", "none"):
            self.scheduler = None  # cosine is closed form, see _cosine_lr
        else:
            raise ValueError(f'Scheduler "{config.scheduler}" undefined.')

        # init model + optimizer state
        if initial_variables is None:
            k_init = jax.random.PRNGKey(config.seed)
            if init_input is None:
                init_input = jnp.zeros((1, ds.sample_points, ds.n_features),
                                       jnp.float32)
            if init_fn is not None:
                variables = init_fn(k_init, init_input)
            else:
                variables = self.model.init(k_init, init_input, train=False)
        else:
            variables = initial_variables
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)

        self.training_history: dict[str, list] = {}
        self.validation_history: dict[str, list] = {}
        self.best_epoch = 0
        self.best_val = float("inf")
        self.best_snapshot = None
        self.rebuild_jit()

    def rebuild_jit(self):
        """(Re-)compile the epoch/val functions — call after mutating
        `self.model` (e.g. activating DG-SSM heads)."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            # params/batch_stats/opt_state replicated; per-step losses and
            # loss components replicated (GSPMD inserts the gradient psum)
            self._epoch_fn = jax.jit(self._epoch, donate_argnums=(0, 1, 2),
                                     out_shardings=(rep, rep, rep, rep, rep))
            self._val_fn = jax.jit(self._validate, out_shardings=(rep, rep))
        else:
            self._epoch_fn = jax.jit(self._epoch, donate_argnums=(0, 1, 2))
            self._val_fn = jax.jit(self._validate)
        self._vis_fn = None
        if self.visualization_fn is not None:
            def _vis(params, batch_stats, case_idx, rng):
                x, y = self.batch_fn(rng, case_idx, False)
                out, _ = self._apply(params, batch_stats, x, False)
                return x, y, out
            self._vis_fn = jax.jit(_vis)

    def _shard_batch_idx(self, idx: jnp.ndarray, batch_dim: int):
        """Place a (…, batch) index array with the batch axis sharded over
        the mesh (no-op without a mesh)."""
        if self.mesh is None:
            return idx
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = [None] * idx.ndim
        if idx.shape[batch_dim] % self.mesh.shape[self.mesh_axis] == 0:
            spec[batch_dim] = self.mesh_axis  # else: replicate (e.g. small
            # validation sets — still correct, just not partitioned)
        return jax.device_put(idx, NamedSharding(self.mesh, P(*spec)))

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
    def _apply(self, params, batch_stats, x, train, rng=None):
        variables = {"params": params, "batch_stats": batch_stats}
        if self.forward_fn is not None:
            return self.forward_fn(variables, x, train)
        if train:
            rngs = None if rng is None else {"dropout": rng}
            out, mutated = self.model.apply(variables, x, train=True,
                                            mutable=["batch_stats"],
                                            rngs=rngs)
            return out, mutated["batch_stats"]
        return self.model.apply(variables, x, train=False), batch_stats

    def _loss_and_out(self, params, batch_stats, x, y, train, epoch, rng=None):
        out, new_bs = self._apply(params, batch_stats, x, train, rng)
        if self.epoch_in_loss:
            loss, comps = self.loss_fn(out, y, epoch=epoch)
        else:
            loss, comps = self.loss_fn(out, y)
        return loss, (comps, new_bs)

    def _epoch(self, params, batch_stats, opt_state, case_perm, rng, epoch):
        """case_perm: (steps, batch) indices into the dataset."""

        def step(carry, inp):
            params, batch_stats, opt_state = carry
            idx, r = inp
            r_batch, r_drop = jax.random.split(r)
            x, y = self.batch_fn(r_batch, idx, True)
            (loss, (comps, new_bs)), grads = jax.value_and_grad(
                self._loss_and_out, has_aux=True)(params, batch_stats, x, y,
                                                  True, epoch, r_drop)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state), (loss, comps)

        rngs = jax.random.split(rng, case_perm.shape[0])
        (params, batch_stats, opt_state), (losses, comps) = jax.lax.scan(
            step, (params, batch_stats, opt_state), (case_perm, rngs))
        return params, batch_stats, opt_state, losses, comps

    def _validate(self, params, batch_stats, case_idx, rng, epoch):
        x, y = self.batch_fn(rng, case_idx, False)
        loss, (comps, _) = self._loss_and_out(params, batch_stats, x, y,
                                              False, epoch)
        return loss, comps

    # ---- host-side epoch orchestration ----
    def _make_perm(self, rng: np.random.Generator) -> np.ndarray:
        idx = np.asarray(self.train_indices)
        b, s = self.cfg.batch_size, self.steps_per_epoch
        perm = rng.permutation(len(idx))
        need = s * b
        if need > len(idx):  # wrap (pad the last partial batch with re-draws)
            perm = np.concatenate([perm, rng.permutation(len(idx))[: need - len(idx)]])
        return idx[perm[:need]].reshape(s, b)

    def _record(self, history, values: dict, epoch):
        for k, v in values.items():
            history.setdefault(k, [0.0] * self.cfg.epochs)
            history[k][epoch] = float(v)

    # ---- checkpoint / resume (capability beyond the reference) ----
    @property
    def _ckpt_path(self):
        return os.path.join(self.out_dir, "checkpoint.pkl")

    def save_checkpoint(self, epoch: int):
        state = {
            "epoch": epoch,
            "params": jax.device_get(self.params),
            "batch_stats": jax.device_get(self.batch_stats),
            "opt_state": jax.device_get(self.opt_state),
            "training_history": self.training_history,
            "validation_history": self.validation_history,
            "best_epoch": self.best_epoch, "best_val": self.best_val,
            "best_snapshot": self.best_snapshot,
            "scheduler": self.scheduler.state_dict() if self.scheduler else None,
        }
        tmp = self._ckpt_path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, self._ckpt_path)

    def load_checkpoint(self) -> int:
        """Restore full training state; returns the next epoch to run."""
        with open(self._ckpt_path, "rb") as f:
            state = pickle.load(f)
        self.params = state["params"]
        self.batch_stats = state["batch_stats"]
        self.opt_state = jax.tree.map(
            lambda t, s: jnp.asarray(s) if hasattr(t, "dtype") else s,
            self.opt_state, state["opt_state"])
        # pad histories in case the resumed run targets more epochs
        def _pad(h):
            return {k: v + [0.0] * max(0, self.cfg.epochs - len(v))
                    for k, v in h.items()}
        self.training_history = _pad(state["training_history"])
        self.validation_history = _pad(state["validation_history"])
        self.best_epoch = state["best_epoch"]
        self.best_val = state["best_val"]
        self.best_snapshot = state["best_snapshot"]
        if self.scheduler and state["scheduler"]:
            self.scheduler.load_state_dict(state["scheduler"])
        return state["epoch"] + 1

    def run(self, initial_epoch: int = 0, resume: bool = False):
        cfg = self.cfg
        if resume and os.path.exists(self._ckpt_path):
            initial_epoch = self.load_checkpoint()
            print(f"resuming from checkpoint at epoch {initial_epoch}")
        rng_np = np.random.default_rng(cfg.seed + 1)
        key = jax.random.PRNGKey(cfg.seed + 2)
        # replay the host RNG streams so resumed runs see the same data order
        for _ in range(initial_epoch):
            self._make_perm(rng_np)
            key, _, _ = jax.random.split(key, 3)
        training_start = time.time()
        params, batch_stats, opt_state = self.params, self.batch_stats, self.opt_state

        for epoch in range(initial_epoch, cfg.epochs):
            epoch_start = time.time()
            if self.epoch_callback is not None:
                if self.epoch_callback(self, epoch):
                    self.rebuild_jit()
            if cfg.scheduler == "cosine":
                opt_state.hyperparams["learning_rate"] = self._cosine_lr(epoch)
            key, k_ep, k_val = jax.random.split(key, 3)
            perm = self._shard_batch_idx(jnp.asarray(self._make_perm(rng_np)), 1)
            ep_dev = jnp.asarray(epoch, jnp.int32)  # traced: no per-epoch recompile
            params, batch_stats, opt_state, losses, comps = self._epoch_fn(
                params, batch_stats, opt_state, perm, k_ep, ep_dev)
            train_vals = {"total_loss": jnp.mean(losses),
                          **{k: jnp.mean(v) for k, v in comps.items()}}
            self._record(self.training_history, train_vals, epoch)

            if self.val_indices:
                vloss, vcomps = self._val_fn(
                    params, batch_stats,
                    self._shard_batch_idx(jnp.asarray(self.val_indices), 0),
                    k_val, ep_dev)
                val_vals = {"total_loss": vloss, **vcomps}
            else:
                val_vals = train_vals
            self._record(self.validation_history, val_vals, epoch)
            val_total = float(val_vals["total_loss"])

            # per-epoch visualization of the validation batch
            # (model_trainer.py:134-136 parity; opt-in, host-side)
            if (self._vis_fn is not None and self.val_indices
                    and (epoch + 1) % self.visualize_every == 0):
                vx, vy, vout = jax.device_get(self._vis_fn(
                    params, batch_stats,
                    self._shard_batch_idx(jnp.asarray(self.val_indices), 0),
                    k_val))
                self.visualization_fn(vx, vy, vout, epoch, self.out_dir)

            if cfg.scheduler == "plateau":
                opt_state.hyperparams["learning_rate"] = self.scheduler.step(val_total)

            if val_total <= self.best_val:
                self.best_val = val_total
                self.best_epoch = epoch
                self.best_snapshot = jax.device_get({"params": params,
                                                     "batch_stats": batch_stats})

            if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
                self.params, self.batch_stats, self.opt_state = \
                    params, batch_stats, opt_state
                self.save_checkpoint(epoch)

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
