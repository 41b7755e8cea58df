"""Multi-chip ensembled full-cloud inference.

The reference's serving loop runs >=50 sequential subset forwards on one GPU
(point_seg_net.py:21-48). The subsets are embarrassingly parallel, so here
they are `shard_map`ped across the mesh: each device runs R/n_devices
subsets against the (replicated) full cloud and produces a partial (N, C)
softmax accumulator; one `psum` over ICI merges them. This is the workload's
"ensemble parallelism" (SURVEY.md §2.5 TPU plan).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.ensemble import build_subsets


def sharded_ensemble_predict(apply_fn, variables, pc: jnp.ndarray,
                             rng: jax.Array, mesh: Mesh,
                             sample_points: int = 2048, n_runs_min: int = 50,
                             subset_batch: int = 5, axis: str = "data") -> jnp.ndarray:
    """Like models.ensemble.ensemble_predict, but subsets are sharded over
    the mesh axis `axis`. Returns (N, num_classes) softmax scores."""
    n = pc.shape[0]
    n_dev = mesh.shape[axis]
    subsets = build_subsets(rng, n, sample_points, n_runs_min)
    # pad the run count to a multiple of n_dev * subset_batch
    group = n_dev * subset_batch
    r = subsets.shape[0]
    if r % group:
        pad = group - r % group
        subsets = jnp.concatenate([subsets, subsets[:pad]], axis=0)

    num_classes = jax.eval_shape(
        lambda v, x: apply_fn(v, x, train=False), variables,
        jnp.zeros((1, sample_points, pc.shape[-1]), pc.dtype)).shape[-1]

    def per_device(variables, pc, subsets_local):
        # subsets_local: (R/n_dev, S)
        groups = subsets_local.reshape(-1, subset_batch, subsets_local.shape[-1])

        def body(acc, idx_group):
            x = pc[idx_group]
            probs = jax.nn.softmax(apply_fn(variables, x, train=False), axis=-1)
            return acc.at[idx_group.reshape(-1)].add(
                probs.reshape(-1, probs.shape[-1])), None

        acc0 = jnp.zeros((pc.shape[0], num_classes), jnp.float32)
        acc, _ = jax.lax.scan(body, acc0, groups)
        return jax.lax.psum(acc, axis)

    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    acc = jax.jit(fn)(variables, pc, subsets)
    return jax.nn.softmax(acc, axis=-1)
