"""Ensembled full-point-cloud inference.

TPU-native re-design of the reference's serving loop
(models/point_seg_net.py:21-48): the full cloud (up to ~20k points) is
segmented by running the network on many random `sample_points`-sized subsets
and accumulating softmax scores.

The reference runs 50+ sequential forward passes and then a *data-dependent*
repair pass over points that were never sampled. That's hostile to XLA
(dynamic shapes, host sync). Instead we draw R subsets such that coverage is
**guaranteed by construction**: the first ceil(N/S) subsets are a partition of
a random permutation of all N points (wrapping the tail), the remaining
subsets are additional random draws. All subsets are batched into one
(R, S)-indexed forward — a single compiled computation, embarrassingly
parallel over R (shard-mappable across chips, see parallel/).

Matches the reference's accumulation semantics: softmax scores are summed per
point and a final softmax is applied to the accumulator
(point_seg_net.py:26-48).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def build_subsets(rng: jax.Array, n_points: int, sample_points: int,
                  n_runs_min: int = 50) -> jnp.ndarray:
    """Subset index matrix (R, sample_points) with guaranteed coverage."""
    n_cover = -(-n_points // sample_points)  # ceil
    n_runs = max(n_runs_min, n_cover)
    rngs = jax.random.split(rng, n_runs + 1)
    # covering subsets: partition of one permutation, tail wrapped
    perm = jax.random.permutation(rngs[0], n_points)
    pad = n_cover * sample_points - n_points
    covered = jnp.concatenate([perm, perm[:pad]]) if pad else perm
    covering = covered.reshape(n_cover, sample_points)
    if n_runs == n_cover:
        return covering
    extra = jnp.stack([
        jax.random.permutation(r, n_points)[:sample_points]
        for r in rngs[1 : n_runs - n_cover + 1]
    ])
    return jnp.concatenate([covering, extra], axis=0)


@functools.partial(jax.jit, static_argnames=("apply_fn", "subset_batch"))
def _ensemble_forward(apply_fn, variables, pc, subsets, subset_batch=5):
    """Run apply_fn over all subsets, scatter-accumulate softmax scores.

    :param pc: (N, C) full point cloud
    :param subsets: (R, S) indices; R must be divisible by subset_batch
    :return: (N, num_classes) accumulated scores (pre-final-softmax)
    """
    r, s = subsets.shape
    sb = subset_batch
    assert r % sb == 0, f"n_runs {r} must be divisible by subset_batch {sb}"
    sub_groups = subsets.reshape(r // sb, sb, s)

    def body(acc, idx_group):
        x = pc[idx_group]  # (sb, S, C)
        logits = apply_fn(variables, x, train=False)
        probs = jax.nn.softmax(logits, axis=-1)
        # scatter-add each subset's probs into the (N, C) accumulator
        acc = acc.at[idx_group.reshape(-1)].add(
            probs.reshape(-1, probs.shape[-1]))
        return acc, None

    acc0 = jnp.zeros((pc.shape[0], _num_classes(apply_fn, variables, pc, subsets)),
                     dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, sub_groups)
    return acc


def _num_classes(apply_fn, variables, pc, subsets):
    out = jax.eval_shape(lambda v, x: apply_fn(v, x, train=False),
                         variables, jnp.zeros((1, subsets.shape[1], pc.shape[-1]),
                                              pc.dtype))
    return out.shape[-1]


def ensemble_predict(apply_fn, variables, pc: jnp.ndarray, rng: jax.Array,
                     sample_points: int = 2048, n_runs_min: int = 50,
                     subset_batch: int = 5) -> jnp.ndarray:
    """Softmax segmentation of a full cloud by subset ensembling.

    :param apply_fn: model.apply-like callable (variables, (B, S, C), train=False)
        -> (B, S, num_classes) logits
    :param pc: (N, C) full point cloud (N >= sample_points)
    :return: (N, num_classes) final softmax scores
    """
    n = pc.shape[0]
    subsets = build_subsets(rng, n, sample_points, n_runs_min)
    r = subsets.shape[0]
    if r % subset_batch:  # pad with repeats of the first subsets to a multiple
        padr = subset_batch - r % subset_batch
        subsets = jnp.concatenate([subsets, subsets[:padr]], axis=0)
    acc = _ensemble_forward(apply_fn, variables, pc, subsets, subset_batch)
    return jax.nn.softmax(acc, axis=-1)
