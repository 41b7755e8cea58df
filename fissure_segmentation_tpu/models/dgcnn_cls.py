"""Open-source-style classification DGCNN + multi-head regression variant.

Counterpart of reference models/dgcnn_opensrc.py:101-179 (`DGCNN`: 4 EdgeConv
[64,64,128,256] -> 1x1 conv to emb_dims -> global max+avg pooling -> FC head)
and models/dg_ssm.py:13-88 (`RegressionHead`, `MultiHeadDGCNN` with per-head
activation flags used by the DG-SSM head schedule). Channel-last layout;
graph build via ops.knn (self-loop included, dgcnn_opensrc.py:34-40).
"""
from __future__ import annotations

from typing import Any, Mapping, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import knn
from .blocks import EdgeMLP, SharedMLP, xavier_normal


class RegressionHead(nn.Module):
    """Linear stack with BN+Dropout+LeakyReLU between layers
    (dg_ssm.py:13-28); last layer bias-free per reference quirk."""
    out_channels: Sequence[int]
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        chans = list(self.out_channels)
        x = nn.Dense(chans[0], use_bias=False, kernel_init=xavier_normal)(x)
        for i, oc in enumerate(chans[1:]):
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Dense(oc, use_bias=not i == len(chans[1:]) - 1,
                         kernel_init=xavier_normal)(x)
        return x


class DGCNNCls(nn.Module):
    """Global-feature DGCNN (dgcnn_opensrc.py:101-179). Returns (out (B, C),
    global_feature (B, 2*emb_dims))."""
    k: int
    output_channels: int
    emb_dims: int = 1024
    dropout: float = 0.0
    static: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        graph = knn(x[..., :3], self.k, self_loop=True) if self.static else None
        feats = []
        h = x
        for out in (64, 64, 128, 256):
            idx = graph if graph is not None else knn(h, self.k, self_loop=True)
            if self.dtype is not None:
                h = h.astype(self.dtype)
            e = EdgeMLP(out, dtype=self.dtype)(h, idx, train)
            h = jnp.max(e, axis=-2)
            feats.append(h)
        h = jnp.concatenate(feats, axis=-1)
        h = SharedMLP(self.emb_dims, dtype=self.dtype)(h, train)  # (B, N, emb)
        gmax = jnp.max(h, axis=-2)
        gavg = jnp.mean(h, axis=-2)
        g = jnp.concatenate([gmax, gavg], axis=-1)      # (B, 2*emb)

        y = nn.Dense(512, use_bias=False, kernel_init=xavier_normal)(g)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(y)
        y = nn.leaky_relu(y, 0.2)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(256, kernel_init=xavier_normal)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(y)
        y = nn.leaky_relu(y, 0.2)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.output_channels, kernel_init=xavier_normal)(y)
        return y.astype(jnp.float32), g.astype(jnp.float32)


class MultiHeadDGCNN(nn.Module):
    """DGCNNCls + named regression heads off the global feature
    (dg_ssm.py:31-88). `active_heads` gates heads (inactive -> zeros, or ones
    for 'scaling'); 'main' gating zeroes the main output."""
    k: int
    output_channels_main: int
    head_channels: Mapping[str, Tuple[int, ...]] = None
    emb_dims: int = 1024
    dropout: float = 0.0
    static: bool = False
    active_heads: Tuple[str, ...] = ("main", "translation", "rotation", "scaling")

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        heads = self.head_channels or {
            "translation": (512, 50, 3),
            "rotation": (512, 50, 3),
            "scaling": (512, 50, 3),
        }
        main, g = DGCNNCls(self.k, self.output_channels_main, self.emb_dims,
                           self.dropout, self.static)(x, train)
        if "main" not in self.active_heads:
            main = jnp.zeros_like(main)
        outs = {}
        for name, chans in heads.items():
            out = RegressionHead(tuple(chans), self.dropout, name=f"head_{name}")(g, train)
            if name not in self.active_heads:
                out = jnp.ones_like(out) if name == "scaling" else jnp.zeros_like(out)
            outs[name] = out
        return main, outs
