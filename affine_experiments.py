"""Affine registration sanity-check experiments.

Counterpart of reference affine_dgcnn.py:112-362 (`run_example` grid): can a
global point-cloud network recover a known random rigid transform of a fixed
shape? Trains on freshly sampled random transforms each step, reports angle
RMSE, translation RMSE (in world mm via the shape scale) and corresponding-
point error, and writes a `training_progression.csv`.

TPU-first differences: the whole (sample-transform -> forward -> loss ->
update) step is one jitted function; metrics accumulate on device and are
fetched once per epoch.
"""
from __future__ import annotations

import argparse
import csv
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fissure_segmentation_tpu.data.augmentation import compose_transform
from fissure_segmentation_tpu.losses.dgssm import corresponding_point_distance
from fissure_segmentation_tpu.models import AFFINE_MODELS
from fissure_segmentation_tpu.utils.detached_run import maybe_run_detached_cli
from fissure_segmentation_tpu.models.affine import (random_transformation,
                                                    rotate_around_center)


def normalized_target_shape(rng: np.random.Generator, n_points: int = 1024):
    """A fixed target shape in the unit sphere (affine_dgcnn.py:186-195).
    Without the corresponding-point dataset on disk, a synthetic fissure-like
    surface stands in."""
    from fissure_segmentation_tpu.data.synthetic import (make_synthetic_case,
                                                         sample_fissure_surface)
    case = make_synthetic_case(int(rng.integers(1 << 31)), n_points=n_points,
                               with_feature=False)
    pts = case["coords"][:n_points].astype(np.float32)
    pts = pts - pts.mean(0, keepdims=True)
    scale = np.sqrt((pts ** 2).sum(-1)).max()
    return pts / scale, float(scale)


def make_train_step(model, optimizer, target_shape, do_rotation,
                    do_translation, use_point_loss, use_param_loss):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch_stats, rng):
        rng, r_t = jax.random.split(rng)
        t, log_rot, trans = random_transformation(
            r_t, 8, rotation=do_rotation, translation=do_translation)
        shapes = rotate_around_center(target_shape[None], t)

        def loss_fn(p):
            (rot_p, tr_p), updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, shapes, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(rng, 1)})
            pred_t = compose_transform(rot_p, tr_p, jnp.ones_like(tr_p[..., :1]))
            pred_shapes = rotate_around_center(target_shape[None], pred_t)
            pts_ls = ((pred_shapes - shapes) ** 2).mean()
            par_ls = ((jnp.concatenate([rot_p, tr_p], -1)
                       - jnp.concatenate([log_rot, trans], -1)) ** 2).mean()
            loss = (pts_ls * use_point_loss + par_ls * use_param_loss) / \
                (use_point_loss + use_param_loss)
            aux = (updates["batch_stats"], rot_p, tr_p, log_rot, trans,
                   pred_shapes, shapes)
            return loss, aux
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        bs, rot_p, tr_p, log_rot, trans, pred_shapes, shapes = aux
        metrics = dict(
            loss=loss,
            angle_rmse=jnp.sqrt(((rot_p - log_rot) ** 2).mean()),
            trans_rmse=jnp.sqrt(((tr_p - trans) ** 2).sum(-1)).mean(),
            corr_err=corresponding_point_distance(pred_shapes, shapes).mean())
        return params, opt_state, bs, rng, metrics
    return step


def run_example(model_name: str, epochs: int, steps_per_epoch: int,
                out_root: str, do_rotation=True, do_translation=True,
                use_point_loss=True, use_param_loss=False, seed: int = 42):
    tag = (f"{model_name}{'_rot' if do_rotation else ''}"
           f"{'_translation' if do_translation else ''}"
           f"{'_pointloss' if use_point_loss else ''}"
           f"{'_paramloss' if use_param_loss else ''}")
    out_dir = os.path.join(out_root, f"{model_name}_sanity_check", tag)
    os.makedirs(out_dir, exist_ok=True)

    target_np, scale = normalized_target_shape(np.random.default_rng(seed))
    target = jnp.asarray(target_np)

    model = AFFINE_MODELS[model_name](k=40, do_rotation=do_rotation,
                                      do_translation=do_translation)
    variables = model.init(jax.random.PRNGKey(seed), target[None], train=False)
    params, batch_stats = variables["params"], \
        variables.get("batch_stats", {})
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, target, do_rotation,
                           do_translation, use_point_loss, use_param_loss)

    rng = jax.random.PRNGKey(seed + 1)
    history: list[dict] = []
    for epoch in range(epochs):
        acc = None
        for _ in range(steps_per_epoch):
            params, opt_state, batch_stats, rng, m = step(
                params, opt_state, batch_stats, rng)
            acc = m if acc is None else {k: acc[k] + m[k] for k in m}
        hist = {k: float(v) / steps_per_epoch for k, v in acc.items()}
        hist["trans_rmse_mm"] = hist.pop("trans_rmse") * scale
        hist["corr_err_mm"] = hist.pop("corr_err") * scale
        history.append(hist)
        print(f"EPOCH {epoch}: " + " | ".join(
            f"{k}={v:.4f}" for k, v in hist.items()))

    with open(os.path.join(out_dir, "training_progression.csv"), "w",
              newline="") as f:
        writer = csv.writer(f)
        keys = list(history[0])
        for k in keys:
            writer.writerow([k] + [h[k] for h in history])
    return history


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="rigid-transform recovery sanity checks")
    parser.add_argument("--model", default="OpenDGCNN",
                        choices=sorted(AFFINE_MODELS))
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--output", default="results/affine_experiments")
    parser.add_argument("--offline", action="store_true")
    args = parser.parse_args(argv)
    maybe_run_detached_cli(args)

    for do_rotation in (False, True):
        for do_translation in (False, True):
            if not (do_rotation or do_translation):
                continue
            for use_param_loss in (False, True):
                for use_point_loss in (False, True):
                    if not (use_param_loss or use_point_loss):
                        continue
                    run_example(args.model, args.epochs, args.steps,
                                args.output, do_rotation, do_translation,
                                use_point_loss, use_param_loss)


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    main()
