"""Fused single-layer EdgeConv: gather -> +center -> BatchNorm -> LeakyReLU
-> max-over-k WITHOUT materializing the (B, N, k, C) edge tensor.

The reference EdgeConv (models/dgcnn.py:212-243) builds the edge tensor,
batch-normalizes it, activates it and max-pools over k; on TPU the edge
tensor is 335 MB at the canonical config and every forward/backward pass
over it is HBM traffic (PERF.md "Chip characterization"). For the k-max to
commute with the pointwise tail, note that per channel c

    y[n, k] = LeakyReLU(gamma_c * (a[idx[n, k]] + cen[n] - mu_c) / sigma_c
                        + beta_c)

is MONOTONE in a[idx[n, k]] (increasing iff gamma_c >= 0, since LeakyReLU
and the normalization affine are monotone and cen[n] is constant in k). So

    max_k y[n, k] = tail(max_k a[idx[n, k]])   if gamma_c >= 0
                  = tail(min_k a[idx[n, k]])   otherwise

and the whole layer needs only per-(n, c) REDUCTIONS of the gathered
features — max/min/argmax/argmin for the output and routing, sum and
sum-of-squares for the exact BatchNorm train statistics:

    E[z]   = (sum_n s1[n] + k * sum_n cen[n]) / E
    E[z^2] = (sum_n s2[n] + 2 * sum_n cen*s1 + k * sum_n cen^2) / E

The backward never materializes the edge cotangent either: the max-pool
routes dL/dout to ONE edge per (n, c) (the argext slot), and the BatchNorm
train backward adds two dense per-channel terms

    dz[e] = (dxhat[e] - mean_E(dxhat) - xhat[e] * mean_E(dxhat*xhat)) / sigma

whose scatter-transpose decomposes into a sparse argmax-routed scatter, a
k-replicated scatter of a node field, and a degree-weighted pointwise term
— exactly the payload-synthesizing kernel ops/pallas/scatter.py:
scatter_add_routed + scatter_count. HBM traffic per layer drops from
O(B*N*k*C) to O(B*N*C) everywhere except the single forward gather.

Numerics vs the unfused path: bitwise-equal reductions are not guaranteed
(different summation order; in bf16 the unfused path also rounds each edge
before the stats), but agreement is within a few ULPs of the compute dtype
— see tests/test_fused_edge.py. Gradient convention at exact k-ties: the
max subgradient is routed to the FIRST extremal slot (torch.max semantics)
instead of jnp.max's split-among-ties; ties are measure-zero for float
features.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes

from .edge import _flat_gather
from .pallas.scatter import scatter_add_routed, scatter_count

_ENV_FLAG = "FSEG_FUSED_EDGE"
_TAIL_ENV_FLAG = "FSEG_FUSED_EDGE_TAIL"


def fused_tail_enabled(dtype=None) -> bool:
    """Fused LAST-sublayer tail for MULTI-layer EdgeConvs
    (models/blocks.py:FusedEdgeTail — no Pallas kernel involved, pure XLA
    reductions + autodiff). Measured on the v5e (chained A/B, 2026-08-20):
    bf16 train step 87.04 -> 86.54 ms, f32 132.58 -> 131.64 ms — a small
    but consistent win (XLA already fused most of the BN/LReLU passes into
    the matmul/max pipeline; the remaining saving is the BN2 residual and
    stat passes). Default ON on TPU for both dtypes, OFF off-TPU (CPU
    golden tests keep the reference-shaped graph).
    FSEG_FUSED_EDGE_TAIL=1/0 overrides both ways."""
    env = os.environ.get(_TAIL_ENV_FLAG)
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def fused_edge_enabled(dtype=None) -> bool:
    """Fused single-layer EdgeConv routing. Default policy (measured on the
    v5e chip, scripts/prof/prof_fused_edge.py, 2026-08-20): ON for bf16 on
    TPU (train step 89.5 -> 87.0 ms, eval 39.0 -> 38.5 ms), OFF for f32
    (train 132.7 -> 145.1 ms — the f32 hi/lo-split routed scatter doubles
    the one-hot MXU work) and OFF off-TPU (no MXU to absorb the one-hot
    dots; kernels would run in interpret mode). FSEG_FUSED_EDGE=1/0
    overrides both ways (tests force-enable it off-TPU)."""
    env = os.environ.get(_ENV_FLAG)
    if env is not None:
        return env not in ("0", "false", "False")
    return dtype == jnp.bfloat16 and jax.default_backend() == "tpu"


def _gather_reduce(a: jnp.ndarray, idx: jnp.ndarray):
    """One pass over the gathered neighbor features -> per-(n, c) max, min,
    argmax, argmin, sum, sum of squares (the last two in f32)."""
    ga = _flat_gather(a, idx)                       # (B, N, K, C)
    gaf = ga.astype(jnp.float32)
    return (jnp.max(ga, axis=2), jnp.min(ga, axis=2),
            jnp.argmax(ga, axis=2).astype(jnp.int32),
            jnp.argmin(ga, axis=2).astype(jnp.int32),
            jnp.sum(gaf, axis=2), jnp.sum(gaf * gaf, axis=2))


def _stats(s1, s2, cen, kk):
    """Exact BatchNorm train statistics over the virtual (B, N, k) edge set
    (flax semantics: f32, fast variance, clipped at 0)."""
    cenf = cen.astype(jnp.float32)
    e_tot = s1.shape[0] * s1.shape[1] * kk
    mean = (jnp.sum(s1, (0, 1)) + kk * jnp.sum(cenf, (0, 1))) / e_tot
    ez2 = (jnp.sum(s2, (0, 1)) + 2.0 * jnp.sum(cenf * s1, (0, 1))
           + kk * jnp.sum(cenf * cenf, (0, 1))) / e_tot
    var = jnp.maximum(0.0, ez2 - mean * mean)
    return mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_edge_train(a, cen, gamma, beta, idx, eps: float, slope: float):
    """Train-mode fused EdgeConv core.

    :param a: (B, N, C) neighbor-projected features (``x @ w_d``)
    :param cen: (B, N, C) center-projected features (``x @ (w_c - w_d)``)
    :param gamma: (C,) BatchNorm scale (f32)
    :param beta: (C,) BatchNorm bias (f32)
    :param idx: (B, N, K) int32 neighbor indices
    :return: (out (B, N, C) in a.dtype, batch mean (C,) f32, batch var (C,)
        f32) — mean/var feed the running-stats update; their cotangents are
        treated as zero (flax updates running stats outside the loss graph).
    """
    out, mean, var, *_ = _fwd_impl(a, cen, gamma, beta, idx, eps, slope)
    return out, mean, var


def _fwd_impl(a, cen, gamma, beta, idx, eps, slope):
    kk = idx.shape[-1]
    mx, mn, am, amn, s1, s2 = _gather_reduce(a, idx)
    mean, var = _stats(s1, s2, cen, kk)
    sigma = jnp.sqrt(var + eps)
    pos = gamma >= 0
    sel = jnp.where(pos, mx, mn)
    kstar = jnp.where(pos, am, amn)
    zstar = (sel + cen).astype(jnp.float32)
    u = gamma * ((zstar - mean) / sigma) + beta
    out = jnp.where(u >= 0, u, slope * u).astype(a.dtype)
    return out, mean, var, sel, kstar, s1, sigma


def _fused_edge_fwd(a, cen, gamma, beta, idx, eps, slope):
    out, mean, var, sel, kstar, s1, sigma = _fwd_impl(
        a, cen, gamma, beta, idx, eps, slope)
    res = (a, cen, gamma, beta, idx, sel, kstar, s1, mean, sigma)
    return (out, mean, var), res


def _fused_edge_bwd(eps, slope, res, cts):
    g, _, _ = cts          # running-stat outputs are not differentiated
    a, cen, gamma, beta, idx, sel, kstar, s1, mean, sigma = res
    b, n, kk = idx.shape
    e_tot = b * n * kk

    # recompute the pre-activation at the routed (argext) edge
    zstar = (sel + cen).astype(jnp.float32)
    xhat_star = (zstar - mean) / sigma
    u = gamma * xhat_star + beta
    du = g.astype(jnp.float32) * jnp.where(u >= 0, 1.0, slope)

    dbeta = jnp.sum(du, (0, 1))
    dgamma = jnp.sum(du * xhat_star, (0, 1))
    # BatchNorm train backward means over the virtual edge set: the edge
    # cotangent dxhat is nonzero ONLY at the argext slots, so both means
    # collapse to (B, N, C) reductions
    mean_dxh = gamma * dbeta / e_tot                       # E[dxhat]
    mean_dxh_xh = gamma * dgamma / e_tot                   # E[dxhat * xhat]

    # dz[e] = (dxhat[e] - mean_dxh - xhat[e] * mean_dxh_xh) / sigma, with
    # xhat[e] = (a[idx[e]] + cen[n(e)] - mean) / sigma. Transposing the
    # gather splits da into the sparse routed part, a k-replicated node
    # payload, and a degree-weighted pointwise term (see module docstring).
    s_payload = (gamma * du / sigma).astype(a.dtype)
    p_payload = ((-mean_dxh / sigma
                  - (mean_dxh_xh / (sigma * sigma))
                  * (cen.astype(jnp.float32) - mean)).astype(a.dtype))
    routed = scatter_add_routed(idx, kstar, s_payload, p_payload, n)
    deg = scatter_count(idx.reshape(b, n * kk), n)
    c = a.shape[-1]
    da = (routed[..., :c] + routed[..., c:]
          - (mean_dxh_xh / (sigma * sigma)) * deg[..., None]
          * a.astype(jnp.float32))

    sum_xh_k = (s1 + kk * (cen.astype(jnp.float32) - mean)) / sigma
    dcen = (gamma * du - kk * mean_dxh - mean_dxh_xh * sum_xh_k) / sigma

    return (da.astype(a.dtype), dcen.astype(cen.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype),
            np.zeros(idx.shape, dtypes.float0))


fused_edge_train.defvjp(_fused_edge_fwd, _fused_edge_bwd)


def fused_edge_eval(a, cen, gamma, beta, ra_mean, ra_var,
                    idx, eps: float, slope: float) -> jnp.ndarray:
    """Eval-mode fused EdgeConv core: normalize with the RUNNING statistics
    (no batch stats), so the whole layer is the forward gather-reduce plus
    (B, N, C) pointwise math. Differentiable through the standard path
    (inference-time grads are not a hot path)."""
    pos = gamma >= 0
    ga = _flat_gather(a, idx)
    sel = jnp.where(pos, jnp.max(ga, axis=2), jnp.min(ga, axis=2))
    sigma = jnp.sqrt(ra_var + eps)
    u = gamma * (((sel + cen).astype(jnp.float32) - ra_mean) / sigma) + beta
    return jnp.where(u >= 0, u, slope * u).astype(a.dtype)
