"""Seeded random-walk segmentation on voxel grids.

TPU-native counterpart of reference data_processing/random_walk.py:15-116:
the reference assembles a sparse graph Laplacian and solves it with pyamg's
Ruge-Stuben multigrid on the host CPU. On TPU the 6-neighbor grid Laplacian
is a *stencil*: `L x` is a handful of shifted adds with per-edge weights, so
the seeded system ``L_uu u = -L_us u_s`` is solved matrix-free with conjugate
gradient, batched over the object channels — dense VPU work, no sparse
formats, no host round-trip.

Semantics parity: edge weights 'binary' (1 / 0.01, random_walk.py:50-53) or
'intensity' (exp(-diff^2 / 2*sigma^2), sigma=8, :48-49); L = (1e-5 + lambda*D)
on the diagonal, -lambda*A off-diagonal (:70-76); voxels outside `graph_mask`
are removed from the graph.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SIGMA = 8.0
LAMBDA = 1.0
EPS_DIAG = 1e-5


def _edge_weights(im: jnp.ndarray, edge_weights: str, mask: jnp.ndarray):
    """Per-dim forward-edge weights w_d[i] between voxel i and i+1 (along d),
    zeroed when either endpoint is outside the mask."""
    ws = []
    for d in range(3):
        a = jax.lax.slice_in_dim(im, 0, im.shape[d] - 1, axis=d)
        b = jax.lax.slice_in_dim(im, 1, im.shape[d], axis=d)
        if edge_weights == "intensity":
            w = jnp.exp(-((a - b) ** 2) / (2 * SIGMA ** 2))
        elif edge_weights == "binary":
            w = jnp.where(a == b, 1.0, 0.01)
        else:
            raise ValueError(f'No edge weights named "{edge_weights}" known.')
        ma = jax.lax.slice_in_dim(mask, 0, mask.shape[d] - 1, axis=d)
        mb = jax.lax.slice_in_dim(mask, 1, mask.shape[d], axis=d)
        ws.append(jnp.where(ma & mb, w, 0.0))
    return ws


def _laplacian_matvec(x: jnp.ndarray, ws, degree: jnp.ndarray) -> jnp.ndarray:
    """L x for (..., D, H, W) fields x (broadcast over leading dims)."""
    out = (EPS_DIAG + LAMBDA * degree) * x
    for d, w in enumerate(ws):
        ax = x.ndim - 3 + d
        lo = jax.lax.slice_in_dim(x, 0, x.shape[ax] - 1, axis=ax)
        hi = jax.lax.slice_in_dim(x, 1, x.shape[ax], axis=ax)
        contrib_lo = w * hi  # neighbor from the right
        contrib_hi = w * lo  # neighbor from the left
        pad_lo = [(0, 0)] * x.ndim
        pad_lo[ax] = (0, 1)
        pad_hi = [(0, 0)] * x.ndim
        pad_hi[ax] = (1, 0)
        out = out - LAMBDA * (jnp.pad(contrib_lo, pad_lo) + jnp.pad(contrib_hi, pad_hi))
    return out


@functools.partial(jax.jit, static_argnames=("edge_weights", "n_objects",
                                             "cg_iters"))
def random_walk(im: jnp.ndarray, labels: jnp.ndarray, n_objects: int,
                edge_weights: str = "binary",
                graph_mask: jnp.ndarray | None = None,
                cg_iters: int = 500) -> jnp.ndarray:
    """Seeded random walk (random_walk.py:80-116).

    :param im: (D, H, W) image the edge weights are computed from
    :param labels: (D, H, W) int seeds, 0 = unseeded, 1..n_objects = objects
    :param graph_mask: voxels outside get zero probability for all objects
    :return: (D, H, W, n_objects) probabilities
    """
    im = im.astype(jnp.float32)
    mask = jnp.ones(im.shape, bool) if graph_mask is None else graph_mask.astype(bool)
    ws = _edge_weights(im, edge_weights, mask)

    degree = jnp.zeros_like(im)
    for d, w in enumerate(ws):
        pad_lo = [(0, 0)] * 3
        pad_lo[d] = (0, 1)
        pad_hi = [(0, 0)] * 3
        pad_hi[d] = (1, 0)
        degree = degree + jnp.pad(w, pad_lo) + jnp.pad(w, pad_hi)

    seeded = (labels != 0) & mask
    unknown = (~seeded) & mask
    u_s = jax.nn.one_hot(labels - 1, n_objects) * seeded[..., None]  # (D,H,W,C)

    # channels-first for the stencil broadcast: (C, D, H, W)
    u_s = jnp.moveaxis(u_s, -1, 0)
    proj = unknown[None].astype(im.dtype)

    def A(x):  # restricted Laplacian on the unknowns
        return proj * _laplacian_matvec(proj * x, ws, degree)

    b = -proj * _laplacian_matvec(u_s, ws, degree)

    # batched CG over channels
    x0 = jnp.zeros_like(b)
    r0 = b - A(x0)
    p0 = r0

    def body(i, state):
        x, r, p, rs = state
        ap = A(p)
        denom = jnp.sum(p * ap)
        alpha = rs / jnp.maximum(denom, 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.sum(r * r)
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = r + beta * p
        return x, r, p, rs_new

    x, r, p, _ = jax.lax.fori_loop(0, cg_iters, body,
                                   (x0, r0, p0, jnp.sum(r0 * r0)))
    probs = jnp.where(unknown[None], x, u_s)
    probs = jnp.where(mask[None], probs, 0.0)
    return jnp.moveaxis(probs, 0, -1)


def fill_lobes(lobes: jnp.ndarray, mask: jnp.ndarray, n_objects: int | None = None,
               cg_iters: int = 500) -> jnp.ndarray:
    """Grow sparse lobe labels to fill the lung mask
    (find_lobes.py:17-30: binary edge weights from `lobes != 0`)."""
    if n_objects is None:
        n_objects = int(jnp.max(lobes))
    probs = random_walk((lobes != 0).astype(jnp.float32), lobes, n_objects,
                        edge_weights="binary", graph_mask=mask,
                        cg_iters=cg_iters)
    return jnp.where(mask, jnp.argmax(probs, -1) + 1, 0)


def lobes_to_fissures(lobes: jnp.ndarray, mask: jnp.ndarray,
                      cg_iters: int = 500):
    """Fissures = boundaries between specific filled lobes
    (find_lobes.py:33-93). Lobe labels: 1 RLL, 2 RUL, 3 LLL, 4 LUL,
    5 RML (optional).

    :return: (fissures (D, H, W) uint8 labels 1=LOF 2=ROF 3=RHF,
              lobes_filled (D, H, W))
    """
    n_lobes = int(jnp.max(lobes))
    filled = fill_lobes(lobes, mask, n_objects=n_lobes, cg_iters=cg_iters)

    one_hot = jax.nn.one_hot(filled, n_lobes + 1, axis=0, dtype=jnp.float32)
    # 6-neighborhood dilation per channel (find_lobes.py:60-72)
    from ..utils.filters import filter_1d
    k = jnp.asarray([1.0, 1.0, 1.0])
    dil = one_hot
    acc = one_hot
    for d in range(3):
        acc = acc + filter_1d(one_hot, k, d, padding_mode="constant")
    dil = acc > 0.5

    fissures = jnp.zeros(filled.shape, jnp.uint8)
    # guard by the number of lobe channels actually present — out-of-range
    # jax indexing clamps silently and would fabricate fissures
    if n_lobes >= 4:
        lf = dil[3] & dil[4]
        fissures = jnp.where(lf, jnp.uint8(1), fissures)
    if n_lobes >= 2:
        rof = dil[1] & dil[2]
        if n_lobes >= 5:
            rof = rof | (dil[1] & dil[5])
        fissures = jnp.where(rof, jnp.uint8(2), fissures)
    if n_lobes >= 5:
        rhf = dil[2] & dil[5]
        fissures = jnp.where(rhf, jnp.uint8(3), fissures)
    return fissures, filled
