"""Spatial (3-D volume) sharding with halo exchange over ICI.

The reference's patch-based CNN inference is a sequential sliding window on
one GPU (models/seg_cnn.py:15-99). Here the volume's z-axis is sharded over a
device mesh and inference runs slab-parallel with halo collectives expressed
as `jax.lax.ppermute` (which XLA lowers to ICI neighbor transfers on TPU):

  halo_exchange      — symmetric single-hop exchange: every device receives
                       the `halo` boundary rows of both z-neighbors
                       (edge-replicated at the mesh ends). General-purpose
                       primitive (e.g. sharded stencils/convolutions).
  halo_exchange_down / halo_reduce_down — the multi-hop pair used by the
                       sliding window: each patch is OWNED by the device
                       containing its start row, so a device only ever reads
                       *downward* (its own slab + the next ceil(pz/slab)
                       slabs) and its out-of-slab partial sums flow back the
                       same way. Works for any patch size, even larger than
                       a slab.

`sharded_predict_all_patches` reproduces models.seg_cnn.predict_all_patches
numerically: same patch grid, same Gaussian blending — patches partitioned
across devices by start row (padded with weight-0 duplicates so every device
runs one static program), accumulated into extended local slabs, halo-
reduced, normalized, re-assembled.

SURVEY.md §2.5: this is the workload's honest analog of context/sequence
parallelism.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.seg_cnn import gaussian_importance_map, get_patch_starts


def halo_exchange(x_local: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """(local_d, ...) slab -> (halo + local_d + halo, ...) with both
    neighbors' boundary rows; mesh ends edge-replicated. Requires
    halo <= local_d. Call inside shard_map over `axis_name`."""
    if halo > x_local.shape[0]:
        raise ValueError(f"halo {halo} exceeds local slab {x_local.shape[0]}")
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    from_prev = jax.lax.ppermute(
        x_local[-halo:], axis_name, perm=[(i, (i + 1) % n) for i in range(n)])
    from_next = jax.lax.ppermute(
        x_local[:halo], axis_name, perm=[(i, (i - 1) % n) for i in range(n)])
    top = jnp.where(idx == 0, jnp.repeat(x_local[:1], halo, axis=0), from_prev)
    bot = jnp.where(idx == n - 1, jnp.repeat(x_local[-1:], halo, axis=0),
                    from_next)
    return jnp.concatenate([top, x_local, bot], axis=0)


def halo_reduce(y_ext: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Transpose of halo_exchange for accumulations: fold each device's halo
    partial sums into the owning neighbor (interior rows; the replicated
    mesh-end halos have no owner and are dropped)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    core = y_ext[halo:-halo]
    to_prev = jax.lax.ppermute(
        y_ext[:halo], axis_name, perm=[(i, (i - 1) % n) for i in range(n)])
    to_next = jax.lax.ppermute(
        y_ext[-halo:], axis_name, perm=[(i, (i + 1) % n) for i in range(n)])
    add_bot = jnp.where(idx == n - 1, 0.0, to_prev)     # from device idx+1
    add_top = jnp.where(idx == 0, 0.0, to_next)         # from device idx-1
    core = core.at[-halo:].add(add_bot)
    core = core.at[:halo].add(add_top)
    return core


def halo_exchange_down(x_local: jnp.ndarray, hops: int,
                       axis_name: str) -> jnp.ndarray:
    """(slab, ...) -> ((1 + hops) * slab, ...): own slab followed by the
    next `hops` devices' slabs (edge-replicated past the mesh end)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    blocks = [x_local]
    for j in range(1, hops + 1):
        # device m sends its slab to m - j  <=>  i receives from i + j
        blk = jax.lax.ppermute(
            x_local, axis_name, perm=[(m, (m - j) % n) for m in range(n)])
        fill = jnp.repeat(blocks[-1][-1:], x_local.shape[0], axis=0)
        blocks.append(jnp.where(idx + j <= n - 1, blk, fill))
    return jnp.concatenate(blocks, axis=0)


def halo_reduce_down(y_ext: jnp.ndarray, hops: int, slab: int,
                     axis_name: str) -> jnp.ndarray:
    """Transpose of halo_exchange_down: device i's partial sums for the
    slabs of devices i+1..i+hops are sent back and added to their owners.
    ((1 + hops) * slab, ...) -> (slab, ...)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    core = y_ext[:slab]
    for j in range(1, hops + 1):
        blk = y_ext[j * slab:(j + 1) * slab]
        # device m computed contributions for device m + j's slab
        recv = jax.lax.ppermute(
            blk, axis_name, perm=[(m, (m + j) % n) for m in range(n)])
        core = core + jnp.where(idx >= j, recv, 0.0)
    return core


def _partition_starts(starts_z, n_dev: int, slab: int):
    """Assign global patch z-starts to the device owning the start row; pad
    every device's list to equal length with weight-0 dummies."""
    per_dev: list[list[int]] = [[] for _ in range(n_dev)]
    for sz in starts_z:
        d = min(sz // slab, n_dev - 1)
        per_dev[d].append(sz - d * slab)        # local coord in own slab
    width = max(1, max(len(p) for p in per_dev))
    starts = np.zeros((n_dev, width), np.int32)
    valid = np.zeros((n_dev, width), bool)
    for d, p in enumerate(per_dev):
        starts[d, :len(p)] = p
        valid[d, :len(p)] = True
    return starts, valid


def sharded_predict_all_patches(apply_fn, variables, img: jnp.ndarray,
                                num_classes: int, mesh: Mesh,
                                patch_size=(128, 128, 128),
                                min_overlap: float = 0.5,
                                use_gaussian: bool = True,
                                axis_name: str = "data") -> jnp.ndarray:
    """Slab-parallel sliding-window inference, numerically identical to
    models.seg_cnn.predict_all_patches.

    :param img: (D, H, W) volume
    :return: (D, H, W, num_classes) blended softmax output
    """
    n_dev = mesh.shape[axis_name]
    dhw = img.shape
    pz = patch_size[0]

    # same pre-padding as the unsharded path, plus padding to a multiple of
    # n_dev along z
    pad = [max(0, p - s) for s, p in zip(dhw, patch_size)]
    img_p = jnp.pad(img, [(q // 2 + q % 2, q // 2) for q in pad], mode="edge")
    d_pad = (-img_p.shape[0]) % n_dev
    img_p = jnp.pad(img_p, [(0, d_pad), (0, 0), (0, 0)], mode="edge")
    dp, hp, wp = img_p.shape
    slab = dp // n_dev
    hops = math.ceil(pz / slab)

    starts = get_patch_starts((dp - d_pad, hp, wp), min_overlap, patch_size)
    starts_np, valid_np = _partition_starts(starts[0], n_dev, slab)
    gmap = jnp.asarray(gaussian_importance_map(patch_size)) if use_gaussian \
        else jnp.ones(patch_size, jnp.float32)

    starts_dev = jax.device_put(
        jnp.asarray(starts_np), NamedSharding(mesh, P(axis_name)))
    valid_dev = jax.device_put(
        jnp.asarray(valid_np), NamedSharding(mesh, P(axis_name)))
    img_sharded = jax.device_put(
        img_p, NamedSharding(mesh, P(axis_name, None, None)))

    yx_starts = [(sy, sx) for sy in starts[1] for sx in starts[2]]

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis_name, None, None), P(axis_name, None),
                  P(axis_name, None)),
        out_specs=(P(axis_name, None, None, None),
                   P(axis_name, None, None, None)),
    )
    def run(slab_local, starts_local, valid_local):
        ext = halo_exchange_down(slab_local, hops, axis_name)
        # the accumulators must be device-varying like the sharded inputs
        # or the fori_loop carry types disagree under shard_map
        def _varying(x):
            if hasattr(jax.lax, "pcast"):
                return jax.lax.pcast(x, (axis_name,), to="varying")
            return jax.lax.pvary(x, (axis_name,))
        out = _varying(jnp.zeros((ext.shape[0], hp, wp, num_classes)))
        norm = _varying(jnp.zeros((ext.shape[0], hp, wp, 1)))

        def z_body(i, carry):
            out, norm = carry
            sz = starts_local[0, i]
            w = valid_local[0, i].astype(jnp.float32)
            for sy, sx in yx_starts:
                patch = jax.lax.dynamic_slice(
                    ext, (sz, sy, sx), (pz, patch_size[1], patch_size[2]))
                logits = apply_fn(variables, patch[None, ..., None],
                                  train=False)[0]
                contrib = jax.nn.softmax(logits, -1) * gmap[..., None] * w
                out = jax.lax.dynamic_update_slice(
                    out, jax.lax.dynamic_slice(
                        out, (sz, sy, sx, 0),
                        (pz, patch_size[1], patch_size[2], num_classes))
                    + contrib, (sz, sy, sx, 0))
                norm = jax.lax.dynamic_update_slice(
                    norm, jax.lax.dynamic_slice(
                        norm, (sz, sy, sx, 0),
                        (pz, patch_size[1], patch_size[2], 1))
                    + gmap[..., None] * w, (sz, sy, sx, 0))
            return out, norm

        out, norm = jax.lax.fori_loop(0, starts_local.shape[1], z_body,
                                      (out, norm))
        return halo_reduce_down(out, hops, slab, axis_name), \
            halo_reduce_down(norm, hops, slab, axis_name)

    out, norm = run(img_sharded, starts_dev, valid_dev)
    out = out / jnp.maximum(norm, 1e-12)
    lo = [q // 2 + q % 2 for q in pad]
    out = out[lo[0]:lo[0] + dhw[0], lo[1]:lo[1] + dhw[1],
              lo[2]:lo[2] + dhw[2]]
    return jax.nn.softmax(out, axis=-1)
