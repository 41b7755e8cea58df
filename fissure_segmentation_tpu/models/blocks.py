"""Shared building blocks for point-cloud networks.

Channel-last counterparts of the reference's ConvBlock/SharedFullyConnected
(models/dgcnn.py:282-343) and MLPBlock (models/point_net.py:11-30): a 1x1
"conv" over points is a plain Dense on the last axis, which XLA maps straight
onto the MXU with no layout shuffling.

BatchNorm matches torch defaults (momentum 0.1 -> flax momentum 0.9,
eps 1e-5); Dense layers use xavier-normal init / zero bias like the
reference's init_weights (utils/model_utils.py:11-15).

`dtype` (optional, e.g. jnp.bfloat16) sets the *compute* dtype of the Dense
matmuls and norms while parameters stay float32 — the TPU analog of the
reference's AMP autocast (model_trainer.py:92): bf16 feeds the MXU at 2x
f32 rate on v5e. Pass dtype=None (default) for full f32.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.edge import edge_mlp_pre_gather
from ..ops.fused_edge import (fused_edge_enabled, fused_edge_eval,
                              fused_edge_train)

xavier_normal = nn.initializers.xavier_normal()


class _BNParams(nn.Module):
    """Variable container structurally identical to ``nn.BatchNorm`` (scale/
    bias params + mean/var batch_stats, all f32) for layers that compute the
    normalization themselves (FusedEdgeMLPMax). Checkpoints are
    interchangeable with the unfused path."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,),
                                                  jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,),
                                                jnp.float32))
        return scale, bias, ra_mean, ra_var


class FusedEdgeMLPMax(nn.Module):
    """Single-layer EdgeConv (EdgeMLP + max-over-k) with the edge tensor
    never materialized — see ops/fused_edge.py. Parameter/batch-stats tree
    is IDENTICAL to ``EdgeMLP`` (kernel + BatchNorm_0), so checkpoints and
    weight-copy utilities work unchanged; EdgeConv routes here when the
    block has exactly one shared-MLP layer and fused_edge_enabled()."""
    features: int
    negative_slope: float = 0.2
    dtype: Any = None
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, idx: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        w = self.param("kernel", xavier_normal, (2 * c, self.features),
                       jnp.float32)
        scale, bias, ra_mean, ra_var = _BNParams(self.features,
                                                 name="BatchNorm_0")()
        dt = self.dtype or jnp.result_type(x)
        xd = x.astype(dt)
        a = xd @ w[:c].astype(dt)
        cen = xd @ (w[c:] - w[:c]).astype(dt)
        if train:
            out, mean, var = fused_edge_train(
                a, cen, scale, bias, idx, self.epsilon, self.negative_slope)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
            return out
        return fused_edge_eval(a, cen, scale, bias, ra_mean.value,
                               ra_var.value, idx, self.epsilon,
                               self.negative_slope)


class FusedEdgeTail(nn.Module):
    """LAST sublayer of a multi-layer EdgeConv: per-edge Dense + BatchNorm +
    LeakyReLU + max-over-k, with the pointwise tail commuted through
    per-(n, c) REDUCTIONS of the Dense output (the same per-channel
    monotonicity argument as ops/fused_edge.py, applied after the second
    Dense): per channel c the post-BN activation is monotone in
    q[n, k, c] = (e1[n, k, :] @ W)[c], so

        max_k LeakyReLU(BN(q))[n, k, c] = tail_c(ext_k q[n, k, c])

    with ext = max if gamma_c >= 0 else min, and the exact train-mode
    BatchNorm statistics come from sum / sum-of-squares k-reductions of q.
    The (B, N, k, F) post-BN tensor, its LeakyReLU, and their backward
    cotangent passes are never materialized — the Dense itself still runs
    per edge (its max cannot commute through a k-varying linear
    combination). Backward is plain autodiff: the extremum routes the
    cotangent through one masked pass over q, and dW/de1 are the usual
    matmul transposes.

    The single extremum is computed as sign * max_k(sign * q) (one reduction
    + one backward mask pass instead of a max/min pair). Gradient convention
    at exact k-ties follows jnp.max (split among ties) — like the unfused
    path, unlike ops/fused_edge.py's torch-style first-slot routing.

    Parameter/batch-stats tree is IDENTICAL to ``SharedMLP`` (Dense_0 +
    BatchNorm_0), so checkpoints are interchangeable with the unfused tree.

    Reference hot path this replaces: models/dgcnn.py:212-243 (second edge
    shared-MLP layer + max pool over the materialized edge tensor).
    """
    features: int
    negative_slope: float = 0.2
    dtype: Any = None
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, e: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        q = nn.Dense(self.features, use_bias=False,
                     kernel_init=xavier_normal, dtype=self.dtype,
                     name="Dense_0")(e)                       # (B, N, k, F)
        scale, bias, ra_mean, ra_var = _BNParams(self.features,
                                                 name="BatchNorm_0")()
        sign = jnp.where(scale >= 0, 1.0, -1.0).astype(q.dtype)
        sel = sign * jnp.max(sign * q, axis=-2)               # (B, N, F)
        if train:
            qf = q.astype(jnp.float32)
            e_tot = int(np.prod(q.shape[:-1]))
            red = tuple(range(q.ndim - 1))
            mean = jnp.sum(qf, axis=red) / e_tot
            ez2 = jnp.sum(qf * qf, axis=red) / e_tot
            var = jnp.maximum(0.0, ez2 - mean * mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        sigma = jnp.sqrt(var + self.epsilon)
        u = scale * ((sel.astype(jnp.float32) - mean) / sigma) + bias
        return jnp.where(u >= 0, u, self.negative_slope * u).astype(q.dtype)


class EdgeMLP(nn.Module):
    """First shared-MLP layer of an EdgeConv, fused with the edge-feature
    build via matmul-before-gather fission (ops/edge.py:edge_mlp_pre_gather).

    Mathematically identical to
    ``SharedMLP(f)(edge_features(x, idx))`` — same (2C, F) xavier-normal
    kernel (rows [:C] act on ``x_j - x_i``, rows [C:] on ``x_i``), same
    BatchNorm-over-edges + LeakyReLU — but the Dense runs on N rows instead
    of N*k and the (B, N, k, 2C) edge tensor is never materialized.
    """
    features: int
    negative_slope: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, idx: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        w = self.param("kernel", xavier_normal, (2 * c, self.features),
                       jnp.float32)
        dt = self.dtype or jnp.result_type(x)
        z = edge_mlp_pre_gather(x.astype(dt), idx, w.astype(dt))
        z = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(z)
        return nn.leaky_relu(z, self.negative_slope)


class SharedMLP(nn.Module):
    """Dense (+ BatchNorm + LeakyReLU) applied point-wise.

    `last_layer=True` disables norm + activation and enables bias
    (reference SharedFullyConnected, dgcnn.py:318-324).
    """
    features: int
    negative_slope: float = 0.2
    last_layer: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.features, use_bias=self.last_layer,
                     kernel_init=xavier_normal, dtype=self.dtype)(x)
        if not self.last_layer:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, axis_name=None,
                             dtype=self.dtype)(x)
            x = nn.leaky_relu(x, self.negative_slope)
        return x


class MLPStack(nn.Module):
    """A stack of SharedMLPs (reference MLPBlock, point_net.py:11-30 uses
    slope 0.01; DGCNN stacks use 0.2)."""
    features: Sequence[int]
    negative_slope: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for f in self.features:
            x = SharedMLP(f, negative_slope=self.negative_slope,
                          dtype=self.dtype)(x, train)
        return x
