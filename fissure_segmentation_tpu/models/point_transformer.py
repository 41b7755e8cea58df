"""PointTransformer segmentation network (vector self-attention U-Net).

TPU-first re-design of reference models/pointtransformer/seg_model.py (from
POSTECH point-transformer): 5-stage encoder with FPS downsampling (stride
[1,4,4,4,4], planes [32,64,128,256,512], nsample [8,16,16,16,16], blocks
[2,3,4,6,3]), symmetric decoder with inverse-distance interpolation, vector
attention over k neighbors with positional encoding and share_planes
grouping. The reference requires the `pointops_cuda` extension; here every
neighborhood op is ops/fps.py + ops/pointops.py (matmul + top-k + gather) on
fixed-shape (B, N, C) batches.

`dtype` (e.g. jnp.bfloat16) sets the compute dtype of the Dense/BN stacks —
the AMP-autocast analog (model_trainer.py:157); FPS/kNN geometry, softmax
and the logits head stay f32.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.fps import farthest_point_sampling
from ..ops.pointops import interpolate, knn_query, query_and_group
from .blocks import xavier_normal


def _bn(train, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype)


class PointTransformerLayer(nn.Module):
    """Vector self-attention among nsample neighbors (seg_model.py:17-53)."""
    out_planes: int
    share_planes: int = 8
    nsample: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, p, x, train: bool = False):
        c = self.out_planes
        s = self.share_planes
        dt = self.dtype
        x_q = nn.Dense(c, kernel_init=xavier_normal, dtype=dt)(x)
        x_k = nn.Dense(c, kernel_init=xavier_normal, dtype=dt)(x)
        x_v = nn.Dense(c, kernel_init=xavier_normal, dtype=dt)(x)

        idx, _ = knn_query(p, p, self.nsample)
        k_grp, _ = query_and_group(p, p, x_k, self.nsample, idx=idx, use_xyz=True)
        v_grp, _ = query_and_group(p, p, x_v, self.nsample, idx=idx, use_xyz=False)
        p_r, x_k = k_grp[..., :3], k_grp[..., 3:]

        # positional encoding MLP: Linear(3->3) + BN + ReLU + Linear(3->c)
        pe = nn.Dense(3, kernel_init=xavier_normal, dtype=dt)(p_r)
        pe = _bn(train, dt)(pe)
        pe = nn.relu(pe)
        pe = nn.Dense(c, kernel_init=xavier_normal, dtype=dt)(pe)  # (B,N,ns,c)

        w = x_k - x_q[..., None, :] + pe  # mid_planes == out_planes
        # linear_w: BN + ReLU + Linear(c -> c/s) + BN + ReLU + Linear(c/s -> c/s)
        w = _bn(train, dt)(w)
        w = nn.relu(w)
        w = nn.Dense(c // s, kernel_init=xavier_normal, dtype=dt)(w)
        w = _bn(train, dt)(w)
        w = nn.relu(w)
        w = nn.Dense(c // s, kernel_init=xavier_normal, dtype=dt)(w)
        # softmax over the NEIGHBOR axis (reference nn.Softmax(dim=1) on an
        # (n, nsample, c) tensor, seg_model.py:33,49) — with our batch dim
        # that is axis -2, i.e. each query's ns attention weights sum to 1
        w = nn.softmax(w.astype(jnp.float32), axis=-2)

        b, n, ns, _ = v_grp.shape
        v = (v_grp + pe).astype(jnp.float32).reshape(b, n, ns, s, c // s)
        out = jnp.sum(v * w[..., None, :], axis=2)            # (B, N, s, c/s)
        return out.reshape(b, n, c)


class PointTransformerBlock(nn.Module):
    """Residual block (seg_model.py:122-142)."""
    planes: int
    share_planes: int = 8
    nsample: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, p, x, train: bool = False):
        identity = x
        dt = self.dtype
        h = nn.Dense(self.planes, use_bias=False, kernel_init=xavier_normal,
                     dtype=dt)(x)
        h = nn.relu(_bn(train, dt)(h))
        h = PointTransformerLayer(self.planes, self.share_planes,
                                  self.nsample, dtype=dt)(p, h, train)
        h = nn.relu(_bn(train, dt)(h))
        h = nn.Dense(self.planes, use_bias=False, kernel_init=xavier_normal,
                     dtype=dt)(h)
        h = _bn(train, dt)(h)
        return nn.relu(h.astype(jnp.float32)
                       + identity.astype(jnp.float32))


class TransitionDown(nn.Module):
    """FPS downsample + local grouping + max-pool (seg_model.py:56-84)."""
    out_planes: int
    stride: int = 1
    nsample: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, p, x, train: bool = False):
        dt = self.dtype
        if self.stride == 1:
            h = nn.Dense(self.out_planes, use_bias=False,
                         kernel_init=xavier_normal, dtype=dt)(x)
            return p, nn.relu(_bn(train, dt)(h)).astype(jnp.float32)
        m = p.shape[-2] // self.stride
        idx = farthest_point_sampling(p, m)
        new_p = jnp.take_along_axis(p, idx[..., None], axis=-2)
        grouped, _ = query_and_group(p, new_p, x, self.nsample, use_xyz=True)
        h = nn.Dense(self.out_planes, use_bias=False,
                     kernel_init=xavier_normal, dtype=dt)(grouped)
        h = nn.relu(_bn(train, dt)(h))
        return new_p, jnp.max(h, axis=-2).astype(jnp.float32)


class TransitionUp(nn.Module):
    """Interpolation upsample + skip fusion (seg_model.py:87-118)."""
    out_planes: int | None = None  # None => summit head (global-context mix)
    in_planes: int | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, p1, x1, p2=None, x2=None, train: bool = False):
        dt = self.dtype
        if x2 is None:
            c = x1.shape[-1]
            g = jnp.mean(x1, axis=-2, keepdims=True)          # per-cloud mean
            g = nn.Dense(c, kernel_init=xavier_normal, dtype=dt)(g)
            g = nn.relu(g)
            g = jnp.broadcast_to(g, (*x1.shape[:-1], g.shape[-1]))
            h = jnp.concatenate([x1.astype(g.dtype), g], axis=-1)
            h = nn.Dense(c, kernel_init=xavier_normal, dtype=dt)(h)
            return nn.relu(_bn(train, dt)(h)).astype(jnp.float32)
        c = self.out_planes
        h1 = nn.Dense(c, kernel_init=xavier_normal, dtype=dt)(x1)
        h1 = nn.relu(_bn(train, dt)(h1)).astype(jnp.float32)
        h2 = nn.Dense(c, kernel_init=xavier_normal, dtype=dt)(x2)
        h2 = nn.relu(_bn(train, dt)(h2)).astype(jnp.float32)
        return h1 + interpolate(p2, p1, h2)


class PointTransformerSeg(nn.Module):
    """(seg_model.py:145-211 + PointTransformerCompatibility:215-231).

    Input (B, N, in_features) with coords first; returns (B, N, num_classes).
    """
    in_features: int
    num_classes: int
    blocks: Sequence[int] = (2, 3, 4, 6, 3)
    planes: Sequence[int] = (32, 64, 128, 256, 512)
    strides: Sequence[int] = (1, 4, 4, 4, 4)
    nsamples: Sequence[int] = (8, 16, 16, 16, 16)
    share_planes: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        p = x[..., :3]
        feats = x  # compatibility wrapper: x0 = p if c==3 else cat(p, feat)
        dt = self.dtype

        # encoder
        ps, xs = [], []
        h = feats
        for stage, (pl, blk, st, ns) in enumerate(zip(self.planes, self.blocks,
                                                      self.strides, self.nsamples)):
            p, h = TransitionDown(pl, st, ns, dtype=dt)(p, h, train)
            for _ in range(1, blk):
                h = PointTransformerBlock(pl, self.share_planes, ns,
                                          dtype=dt)(p, h, train)
            ps.append(p)
            xs.append(h)

        # decoder (2 blocks per stage like the reference's _make_dec)
        h = TransitionUp(None, dtype=dt)(ps[4], xs[4], train=train)
        h = PointTransformerBlock(self.planes[4], self.share_planes,
                                  self.nsamples[4], dtype=dt)(ps[4], h, train)
        for i in (3, 2, 1, 0):
            h = TransitionUp(self.planes[i], dtype=dt)(ps[i], xs[i],
                                                       ps[i + 1], h,
                                                       train=train)
            h = PointTransformerBlock(self.planes[i], self.share_planes,
                                      self.nsamples[i], dtype=dt)(ps[i], h,
                                                                  train)

        out = nn.Dense(self.planes[0], kernel_init=xavier_normal,
                       dtype=dt)(h)
        out = nn.relu(_bn(train, dt)(out))
        return nn.Dense(self.num_classes,
                        kernel_init=xavier_normal)(out.astype(jnp.float32))
