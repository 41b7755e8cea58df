"""PointNet segmentation network.

Channel-last re-design of reference models/point_net.py:55-100 (MLPBlock:11,
TNet:35): local shared-MLP(64,64), optional T-Nets, global max-pooled
1024-d feature, segmentation branch MLP(256,128,64,64,C).

Note: the reference's TNet regression head declares `Conv1d(32, d^2)` on a
256-d input (point_net.py:44) and would crash if `spatial_transform=True`
were ever used — we implement the intended 256 -> d^2 head (zero-init kernel,
identity bias, point_net.py:50-52).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import MLPStack, xavier_normal


class TNet(nn.Module):
    """Input/feature transform net (point_net.py:35-52)."""
    matrix_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        d = self.matrix_size
        t = MLPStack([64, 128, 1024], negative_slope=1e-2)(x, train)
        t = jnp.max(t, axis=-2)  # global max over points
        t = MLPStack([512, 256], negative_slope=1e-2)(t, train)
        t = nn.Dense(d * d, kernel_init=nn.initializers.zeros,
                     bias_init=lambda key, shape, dtype=jnp.float32:
                         jnp.eye(d, dtype=dtype).flatten())(t)
        mat = t.reshape(*t.shape[:-1], d, d)
        return jnp.einsum("...nc,...cd->...nd", x, mat,
                          precision=jax.lax.Precision.HIGHEST)


class PointNetSeg(nn.Module):
    """PointNet segmentation (point_net.py:55-100). Returns (B, N, C) logits.

    `dtype` (e.g. jnp.bfloat16) sets the compute dtype of the shared MLPs
    (the AMP-autocast analog, model_trainer.py:157); T-Nets and the logits
    head stay f32.
    """
    in_features: int
    num_classes: int
    spatial_transform: bool = False
    feature_transform: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.spatial_transform:
            coords = TNet(3)(x[..., :3], train)
            x = jnp.concatenate([coords, x[..., 3:]], axis=-1)

        dt = self.dtype
        x_local = MLPStack([64, 64], negative_slope=1e-2, dtype=dt)(x, train)
        if self.feature_transform:
            x_local = TNet(64)(x_local.astype(jnp.float32), train)

        g = MLPStack([64, 128, 1024], negative_slope=1e-2, dtype=dt)(
            x_local, train)
        g = jnp.max(g, axis=-2, keepdims=True)
        g = jnp.broadcast_to(g, (*x_local.shape[:-1], g.shape[-1]))

        h = MLPStack([256, 128, 64, 64], negative_slope=1e-2, dtype=dt)(
            jnp.concatenate([x_local, g], axis=-1), train)
        out = nn.Dense(self.num_classes, kernel_init=xavier_normal)(
            h.astype(jnp.float32))
        return out
