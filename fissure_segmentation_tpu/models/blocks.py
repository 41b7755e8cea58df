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

from ..ops.edge import edge_mlp_pre_gather

xavier_normal = nn.initializers.xavier_normal()


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
