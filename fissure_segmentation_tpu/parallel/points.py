"""Point-axis sharding: ring-pass kNN graph + neighbor gather over ICI.

The workload's honest analog of context/sequence parallelism (SURVEY.md §5
"long-context analogs"): for clouds beyond one chip's comfortable N (the
reference caps at MAX_KPTS=20000 and subsamples, keypoint_extraction.py:19),
the N-points axis is sharded over a mesh axis. kNN then needs every
query-shard to see every candidate point — instead of an all-gather that
materializes the full cloud per device, the candidate shard ring-rotates
over ICI (`ppermute`, like ring attention): at each of the P steps a device
computes an (N/P, N/P) distance tile (MXU matmul) and folds it into its
running top-k, so peak memory stays O(N/P · (k + N/P)) per device.

Semantics match ops/knn.py exactly (squared euclidean, zeroed self
distance, self_loop include/drop), tested for parity on a virtual 8-device
CPU mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.knn import pairwise_sqdist


def _ring_perm(n_dev: int):
    return [(i, (i + 1) % n_dev) for i in range(n_dev)]


@functools.partial(jax.jit,
                   static_argnames=("k", "mesh", "axis_name", "self_loop",
                                    "return_dist"))
def sharded_knn(coords: jnp.ndarray, k: int, mesh: Mesh,
                axis_name: str = "data", self_loop: bool = False,
                return_dist: bool = False):
    """kNN over a cloud whose points axis is sharded across `axis_name`.

    :param coords: (N, C) points, N divisible by the mesh axis size
    :param k: neighbors per point
    :return: (N, k) int32 *global* neighbor indices, sharded like the
        input [, (N, k) squared distances]
    """
    n_dev = mesh.shape[axis_name]
    n = coords.shape[0]
    if n % n_dev:
        raise ValueError(f"N={n} not divisible by mesh axis {n_dev}")
    n_loc = n // n_dev
    kk = k if self_loop else k + 1
    if kk > n:
        raise ValueError(f"k={k} too large for N={n}")

    def body(local):
        me = jax.lax.axis_index(axis_name)
        my_gidx = me * n_loc + jnp.arange(n_loc)
        block = local
        best_d = jnp.full((n_loc, kk), jnp.inf, jnp.float32)
        best_i = jnp.zeros((n_loc, kk), jnp.int32)
        for step in range(n_dev):
            owner = (me - step) % n_dev
            gidx = owner * n_loc + jnp.arange(n_loc)
            d = pairwise_sqdist(local, block).astype(jnp.float32)
            # self distance: -1 so the self column always sorts first (the
            # dense path zeroes the diagonal and relies on top-k order;
            # ranking the self strictly first is the same semantics, robust
            # to coincident points)
            self_cell = my_gidx[:, None] == gidx[None, :]
            d = jnp.where(self_cell, -1.0, d)
            cand_d = jnp.concatenate([best_d, d], axis=1)
            cand_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(gidx[None, :], d.shape)], axis=1)
            top, sel = jax.lax.top_k(-cand_d, kk)
            best_d = -top
            best_i = jnp.take_along_axis(cand_i, sel, axis=1)
            if n_dev > 1 and step < n_dev - 1:
                block = jax.lax.ppermute(block, axis_name,
                                         _ring_perm(n_dev))
        if not self_loop:
            best_d, best_i = best_d[:, 1:], best_i[:, 1:]
        return best_i, jnp.maximum(best_d, 0.0)

    spec = P(axis_name)
    idx, dist = shard_map(body, mesh=mesh, in_specs=(spec,),
                          out_specs=(spec, spec))(coords)
    return (idx, dist) if return_dist else idx


@functools.partial(jax.jit, static_argnames=("mesh", "axis_name"))
def sharded_gather_neighbors(feats: jnp.ndarray, idx: jnp.ndarray,
                             mesh: Mesh, axis_name: str = "data"):
    """Gather (N, k, C) neighbor features for global indices when both the
    feature table and the queries are sharded along the points axis.

    Ring-rotates the feature shard; each device picks the indices that fall
    in the visiting block's global range (masked gather, no all-gather of
    the full table).
    """
    n_dev = mesh.shape[axis_name]
    n = feats.shape[0]
    n_loc = n // n_dev

    def body(feat_local, idx_local):
        me = jax.lax.axis_index(axis_name)
        block = feat_local
        out = jnp.zeros((*idx_local.shape, feat_local.shape[-1]),
                        feat_local.dtype)
        for step in range(n_dev):
            owner = (me - step) % n_dev
            rel = idx_local - owner * n_loc
            inb = (rel >= 0) & (rel < n_loc)
            picked = block[jnp.clip(rel, 0, n_loc - 1)]
            out = out + jnp.where(inb[..., None], picked, 0)
            if n_dev > 1 and step < n_dev - 1:
                block = jax.lax.ppermute(block, axis_name,
                                         _ring_perm(n_dev))
        return out

    spec = P(axis_name)
    return shard_map(body, mesh=mesh, in_specs=(spec, spec),
                     out_specs=spec)(feats, idx)


def sharded_edge_features(x: jnp.ndarray, k: int, mesh: Mesh,
                          axis_name: str = "data") -> jnp.ndarray:
    """EdgeConv input tensor [x_j - x_i, x_i] (models/dgcnn.py:15-36) for a
    point-axis-sharded cloud: ring kNN + ring gather, output sharded like
    the input.

    :param x: (N, C) features/coords
    :return: (N, k, 2C)
    """
    idx = sharded_knn(x, k, mesh, axis_name)
    xj = sharded_gather_neighbors(x, idx, mesh, axis_name)
    xi = jnp.broadcast_to(x[:, None, :], xj.shape)
    return jnp.concatenate([xj - xi, xi], axis=-1)
