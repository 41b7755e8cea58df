"""DGCNN segmentation / regression networks (EdgeConv graph networks).

TPU-first re-design of reference models/dgcnn.py:61-343. Differences from the
reference are layout only: features are channel-last (B, N, C), EdgeConv's
shared MLP is a Dense over the last axis of the (B, N, k, C) edge tensor
(pure MXU work), and the kNN graph build is a single matmul + top-k
(ops/knn.py). Semantics are preserved:

  * static graph: kNN over coords without self-loop (dgcnn.py:96)
  * dynamic graph: kNN in feature space *with* self-loop; the first EdgeConv
    always builds its graph from the 3 coordinate channels
    (create_neighbor_features, dgcnn.py:15-36)
  * edge features: concat([x_j - x_i, x_i]) -> shared MLP -> max over k
  * seg head: 3x EdgeConv(64) -> 1024-d global max-pool -> MLP(256,256,128,C)
  * optional SpatialTransformer (dgcnn.py:246-279) and ImageFeatures 1x1-conv
    module (dgcnn.py:326-343)
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import knn
from ..ops.fused_edge import fused_edge_enabled, fused_tail_enabled
from .blocks import (EdgeMLP, FusedEdgeMLPMax, FusedEdgeTail, MLPStack,
                     SharedMLP, xavier_normal)


class EdgeConv(nn.Module):
    """EdgeConv block (dgcnn.py:212-243)."""
    features: Sequence[int]
    k: int
    first_layer: bool = False
    dtype: Any = None
    knn_recall: float | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, fixed_knn_graph=None, train: bool = False):
        if fixed_knn_graph is None:
            graph_feats = x[..., :3] if self.first_layer else x
            idx = knn(graph_feats, self.k, self_loop=True,
                      recall_target=self.knn_recall)
        else:
            idx = fixed_knn_graph
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if len(self.features) == 1 and fused_edge_enabled(self.dtype):
            # single-shared-MLP EdgeConvs never materialize the (B, N, k, C)
            # edge tensor (ops/fused_edge.py); same parameter tree
            return FusedEdgeMLPMax(self.features[0], dtype=self.dtype,
                                   name="EdgeMLP_0")(x, idx, train)
        e = EdgeMLP(self.features[0], dtype=self.dtype)(x, idx, train)
        if len(self.features) > 1 and fused_tail_enabled(self.dtype):
            # the final Dense+BN+LReLU+max runs on per-(n, c) reductions of
            # the Dense output; the post-BN edge tensor never materializes
            # (blocks.py:FusedEdgeTail; checkpoint-compatible module name)
            for f in self.features[1:-1]:
                e = SharedMLP(f, dtype=self.dtype)(e, train)
            return FusedEdgeTail(self.features[-1], dtype=self.dtype,
                                 name=f"SharedMLP_{len(self.features) - 2}")(
                e, train)
        for f in self.features[1:]:
            e = SharedMLP(f, dtype=self.dtype)(e, train)
        return jnp.max(e, axis=-2)  # max over neighbors -> (B, N, C')


class SpatialTransformer(nn.Module):
    """Learned affine alignment of the coordinate channels (dgcnn.py:246-279)."""
    k: int
    in_features: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, fixed_knn_graph=None, train: bool = False):
        d = self.in_features
        coords = x[..., :d]
        t = EdgeConv([64, 128], self.k)(coords, fixed_knn_graph, train)
        t = SharedMLP(1024)(t, train)
        t = jnp.max(t, axis=-2)  # global max over points
        t = nn.Dense(512, kernel_init=xavier_normal)(t)
        t = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(t)
        t = nn.leaky_relu(t, 0.2)
        t = nn.Dense(256, kernel_init=xavier_normal)(t)
        t = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(t)
        t = nn.leaky_relu(t, 0.2)
        # transform predicted as identity at init: zero kernel, identity bias
        t = nn.Dense(d * d, kernel_init=nn.initializers.zeros,
                     bias_init=lambda key, shape, dtype=jnp.float32:
                         jnp.eye(d, dtype=dtype).flatten())(t)
        mat = t.reshape(*t.shape[:-1], d, d)
        coords = jnp.einsum("...nc,...cd->...nd", coords, mat,
                            precision=jax.lax.Precision.HIGHEST)
        return jnp.concatenate([coords, x[..., d:]], axis=-1)


class ImageFeatures(nn.Module):
    """1x1-conv embedding of the non-coordinate channels (dgcnn.py:326-343)."""
    out_channels: Sequence[int] = (6, 12)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        feat = x[..., 3:]
        for o in self.out_channels:
            feat = SharedMLP(o, negative_slope=1e-2)(feat, train)
        return jnp.concatenate([x[..., :3], feat], axis=-1)


class DGCNNBase(nn.Module):
    k: int
    in_features: int
    num_classes: int
    spatial_transformer: bool = False
    dynamic: bool = True
    image_feat_module: bool = False
    dtype: Any = None
    # opt-in approximate graph build (ops/knn.py recall_target); None = exact
    knn_recall: float | None = None

    def _common(self, x, train):
        """Shared stem: static graph + image features + spatial transformer
        (DGCNNBase.forward, dgcnn.py:88-106)."""
        graph = None
        if not self.dynamic:
            graph = knn(x[..., :3], self.k, self_loop=False,
                        recall_target=self.knn_recall)
        if self.image_feat_module:
            x = ImageFeatures()(x, train)
        if self.spatial_transformer:
            x = SpatialTransformer(self.k)(x, graph, train)
        return x, graph


class DGCNNSeg(DGCNNBase):
    """Point segmentation DGCNN (dgcnn.py:116-162). Returns (B, N, C) logits."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x, graph = self._common(x, train)
        dt = self.dtype
        kr = self.knn_recall
        x1 = EdgeConv([64, 64], self.k, first_layer=True, dtype=dt,
                      knn_recall=kr)(x, graph, train)
        x2 = EdgeConv([64], self.k, dtype=dt, knn_recall=kr)(x1, graph, train)
        x3 = EdgeConv([64], self.k, dtype=dt, knn_recall=kr)(x2, graph, train)
        multi = jnp.concatenate([x1, x2, x3], axis=-1)
        g = SharedMLP(1024, dtype=dt)(multi, train)
        g = jnp.max(g, axis=-2, keepdims=True)  # global feature (B, 1, 1024)
        g = jnp.broadcast_to(g, (*multi.shape[:-1], g.shape[-1]))
        h = jnp.concatenate([multi, g], axis=-1)
        h = SharedMLP(256, dtype=dt)(h, train)
        h = SharedMLP(256, dtype=dt)(h, train)
        h = SharedMLP(128, dtype=dt)(h, train)
        out = SharedMLP(self.num_classes, last_layer=True, dtype=dt)(h, train)
        return out.astype(jnp.float32)


class DGCNNReg(DGCNNBase):
    """Global regression DGCNN (dgcnn.py:165-209). Returns (B, C) outputs."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x, graph = self._common(x, train)
        dt = self.dtype
        kr = self.knn_recall
        x1 = EdgeConv([64], self.k, first_layer=True, dtype=dt,
                      knn_recall=kr)(x, graph, train)
        x2 = EdgeConv([64], self.k, dtype=dt, knn_recall=kr)(x1, graph, train)
        x3 = EdgeConv([128], self.k, dtype=dt, knn_recall=kr)(x2, graph, train)
        x4 = EdgeConv([256], self.k, dtype=dt, knn_recall=kr)(x3, graph, train)
        multi = jnp.concatenate([x1, x2, x3, x4], axis=-1)
        g = SharedMLP(1024, dtype=dt)(multi, train)
        g = jnp.max(g, axis=-2)  # (B, 1024)
        h = SharedMLP(512, dtype=dt)(g, train)
        h = SharedMLP(256, dtype=dt)(h, train)
        out = SharedMLP(self.num_classes, last_layer=True, dtype=dt)(h, train)
        return out.astype(jnp.float32)
