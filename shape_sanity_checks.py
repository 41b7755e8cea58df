"""Shape-model sanity probes.

Counterpart of two reference correctness-probe scripts:
  adam_shape_fitting.py:10-47  — can Adam recover a weight vector equal to
      the SSM encoding of a target shape (per-shape optimization)?
  adam_shape_fitting.py:49-90  — can Adam recover the eigenvector matrix
      itself from the reconstruction objective?
  dgssm_rigid_toy_example.py   — can a DG-SSM recover known random rigid
      rotations of a fixed shape (corr-point loss only)?

All three run on synthetic corresponding-point shapes (no dataset on disk
needed) and print the same error-vs-baseline numbers the reference does.
Each probe is also exercised by tests/test_shape_sanity.py.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fissure_segmentation_tpu.losses.dgssm import corresponding_point_distance
from fissure_segmentation_tpu.shape_model.ssm import (fit_ssm, ssm_decode,
                                                      ssm_project)


def make_shapes(n: int = 24, p: int = 256, seed: int = 0) -> np.ndarray:
    """Synthetic corresponding-point shapes: a smooth height-field sheet with
    low-rank random deformation modes (stand-in for the registered fissure
    shapes of CorrespondingPointDataset)."""
    rng = np.random.default_rng(seed)
    g = int(np.sqrt(p))
    xs, ys = np.meshgrid(np.linspace(0, 1, g), np.linspace(0, 1, g),
                         indexing="ij")
    base = np.stack([xs, ys, 0.5 + 0.2 * xs + 0.1 * ys ** 2], -1).reshape(-1, 3)
    modes = rng.normal(0, 1, (4, len(base), 3)) * \
        np.array([0.05, 0.03, 0.02, 0.01])[:, None, None]
    w = rng.normal(0, 1, (n, 4))
    shapes = base[None] + np.einsum("nm,mpc->npc", w, modes)
    shapes += rng.normal(0, 0.002, shapes.shape)
    return shapes.astype(np.float32)[:, :p]


def sanity_check_weights(n_iter: int = 300, lr: float = 0.1, verbose=True):
    """Adam recovers per-shape SSM weights (adam_shape_fitting.py:10-47)."""
    shapes = make_shapes()
    ssm = fit_ssm(shapes)

    optimizer = optax.adam(lr)

    @jax.jit
    def fit_one(target):
        w0 = jnp.zeros((1, ssm.num_modes))
        state = optimizer.init(w0)

        def body(carry, _):
            w, state = carry
            def loss_fn(w):
                rec = ssm_decode(ssm, w)
                return ((rec - target[None]) ** 2).mean()
            g = jax.grad(loss_fn)(w)
            upd, state = optimizer.update(g, state, w)
            return (optax.apply_updates(w, upd), state), None

        (w, _), _ = jax.lax.scan(body, (w0, state), None, length=n_iter)
        return ssm_decode(ssm, w)[0]

    diffs, baselines = [], []
    for s in range(len(shapes)):
        target = jnp.asarray(shapes[s])
        rec = fit_one(target)
        optimal = ssm_decode(ssm, ssm_project(ssm, target[None]))[0]
        diffs.append(float(corresponding_point_distance(rec, optimal).mean()))
        baselines.append(float(
            corresponding_point_distance(target, optimal).mean()))
        if verbose:
            print(f"Error: {diffs[-1]:.4f} | Baseline: {baselines[-1]:.4f}")
    return float(np.mean(diffs)), float(np.mean(baselines))


def sanity_check_eigenvectors(n_iter: int = 5000, lr: float = 0.02,
                              verbose=True):
    """Adam recovers an eigenvector matrix whose autoencoding matches the
    PCA optimum (adam_shape_fitting.py:49-90)."""
    shapes = jnp.asarray(make_shapes())
    ssm = fit_ssm(np.asarray(shapes))
    flat = shapes.reshape(len(shapes), -1)
    mean = flat.mean(0, keepdims=True)

    optimal = ssm_decode(ssm, ssm_project(ssm, shapes))
    optimal_err = float(corresponding_point_distance(shapes, optimal).mean())

    m0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                 (flat.shape[1], ssm.num_modes))
    optimizer = optax.adam(lr)

    @jax.jit
    def train(m0):
        state = optimizer.init(m0)

        def body(carry, _):
            m, state = carry
            def loss_fn(m):
                proj = (flat - mean) @ m
                rec = mean + proj @ m.T
                return ((rec - flat) ** 2).mean()
            g = jax.grad(loss_fn)(m)
            upd, state = optimizer.update(g, state, m)
            return (optax.apply_updates(m, upd), state), None

        (m, _), _ = jax.lax.scan(body, (m0, state), None, length=n_iter)
        return m

    m = train(m0)
    rec = (mean + ((flat - mean) @ m) @ m.T).reshape(shapes.shape)
    err = float(corresponding_point_distance(shapes, rec).mean())
    if verbose:
        print(f"Adam-fit reconstruction error: {err:.5f} | "
              f"PCA optimum: {optimal_err:.5f}")
    return err, optimal_err


def dgssm_rigid_toy_example(epochs: int = 30, steps: int = 10,
                            verbose=True):
    """DG-SSM recovers random rigid rotations of a fixed shape
    (dgssm_rigid_toy_example.py): train on rotated copies with the
    corresponding-point loss; error must approach the SSM baseline."""
    from fissure_segmentation_tpu.data.augmentation import (compose_transform,
                                                            transform_points)
    from fissure_segmentation_tpu.models import DGSSM

    shapes = make_shapes(n=16, p=256)
    ssm = fit_ssm(shapes)
    target = jnp.asarray(shapes[0])

    model = DGSSM(k=10, in_features=3, ssm_modes=ssm.num_modes,
                  dynamic=False)
    variables = model.init(jax.random.PRNGKey(0), target[None], ssm,
                           train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, batch_stats, rng):
        rng, r = jax.random.split(rng)
        log_rot = (jax.random.uniform(r, (8, 3)) * 2 - 1) * 1.5
        t = compose_transform(log_rot, jnp.zeros((8, 3)), jnp.ones((8, 1)))
        center = target.mean(0)
        batch = transform_points(target[None] - center, t) + center

        def loss_fn(p):
            (pred, _, _), updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch, ssm,
                train=True, mutable=["batch_stats"])
            l = ((pred - batch) ** 2).mean()
            return l, (updates["batch_stats"],
                       corresponding_point_distance(pred, batch).mean())

        (l, (bs, err)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, bs, rng, err

    rng = jax.random.PRNGKey(1)
    errs = []
    for e in range(epochs):
        acc = 0.0
        for _ in range(steps):
            params, opt_state, batch_stats, rng, err = step(
                params, opt_state, batch_stats, rng)
            acc += float(err)
        errs.append(acc / steps)
        if verbose and e % 5 == 0:
            print(f"EPOCH {e}: corr-point error {errs[-1]:.4f}")
    return errs


def main(argv=None):
    parser = argparse.ArgumentParser(description="shape-model sanity probes")
    parser.add_argument("--probe", default="all",
                        choices=["weights", "eigenvectors", "dgssm", "all"])
    args = parser.parse_args(argv)
    if args.probe in ("weights", "all"):
        sanity_check_weights()
    if args.probe in ("eigenvectors", "all"):
        sanity_check_eigenvectors()
    if args.probe in ("dgssm", "all"):
        dgssm_rigid_toy_example()


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    main()
