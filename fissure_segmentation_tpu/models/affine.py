"""Affine (rigid) registration regression experiments.

Counterpart of reference affine_dgcnn.py:21-109: small nets that regress a
rotation (so(3) log-vector) and a translation from a transformed point cloud.
Three backbones, as in the reference:

  AffineDGCNN      — DGCNNReg backbone (affine_dgcnn.py:21-42)
  AffineOpenDGCNN  — open-source cls DGCNN backbone (affine_dgcnn.py:45-72)
  AffinePointNet   — open-source cls PointNet backbone (affine_dgcnn.py:75-102)

plus the experiment helpers `random_transformation` (affine_dgcnn.py:112-128)
and `rotate_around_center` (affine_dgcnn.py:140-143). Channel-last (B, N, 3)
layout throughout; the rotation composition reuses
data/augmentation.compose_transform (so3 exponential map).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.augmentation import (SimilarityTransform, compose_transform,
                                 transform_points)
from .blocks import MLPStack, xavier_normal
from .dgcnn import DGCNNReg
from .dgcnn_cls import DGCNNCls


def _split_rot_trans(y: jnp.ndarray, do_rotation: bool, do_translation: bool):
    """(B, 3|6) regression output -> (rot (B,3), trans (B,3)) with zeros for
    disabled components (affine_dgcnn.py:30-42)."""
    zeros = jnp.zeros((*y.shape[:-1], 3), y.dtype)
    if do_rotation and do_translation:
        return y[..., :3], y[..., 3:6]
    if do_rotation:
        return y[..., :3], zeros
    return zeros, y[..., :3]


class AffineDGCNN(nn.Module):
    """DGCNNReg regressing so(3) log-rotation + translation."""
    k: int
    in_features: int = 3
    do_rotation: bool = True
    do_translation: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        out = 3 * self.do_rotation + 3 * self.do_translation
        y = DGCNNReg(self.k, self.in_features, out,
                     spatial_transformer=False)(x, train)
        return _split_rot_trans(y, self.do_rotation, self.do_translation)


class AffineOpenDGCNN(nn.Module):
    """Open-source classification DGCNN backbone (emb_dims=1024, dropout=0)."""
    k: int
    do_rotation: bool = True
    do_translation: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        out = 3 * self.do_rotation + 3 * self.do_translation
        y, _ = DGCNNCls(self.k, out, emb_dims=1024, dropout=0.0)(x, train)
        return _split_rot_trans(y, self.do_rotation, self.do_translation)


class PointNetCls(nn.Module):
    """Open-source global-feature PointNet (dgcnn_opensrc.py:69-100):
    shared MLP(64,64,64,128,emb) -> global max-pool -> FC(512) -> FC(C)."""
    output_channels: int
    emb_dims: int = 1024
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        h = MLPStack([64, 64, 64, 128, self.emb_dims],
                     negative_slope=1e-2)(x, train)
        g = jnp.max(h, axis=-2)
        y = nn.Dense(512, use_bias=False, kernel_init=xavier_normal)(g)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.Dense(self.output_channels, kernel_init=xavier_normal)(y)


class AffinePointNet(nn.Module):
    k: int = 40  # unused; kept for ctor parity with the reference
    do_rotation: bool = True
    do_translation: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        out = 3 * self.do_rotation + 3 * self.do_translation
        y = PointNetCls(out, emb_dims=1024, dropout=0.0)(x, train)
        return _split_rot_trans(y, self.do_rotation, self.do_translation)


AFFINE_MODELS = {
    "DGCNN": AffineDGCNN,
    "OpenDGCNN": AffineOpenDGCNN,
    "PointNet": AffinePointNet,
}


def random_transformation(rng: jax.Array, n_samples: int, rotation: bool = True,
                          translation: bool = True):
    """Random rigid transforms for the sanity-check task
    (affine_dgcnn.py:112-128): log-rotation uniform in [-2, 2]^3 rad*axis,
    translation uniform in [-0.2, 0.2]^3 grid units.

    :return: (SimilarityTransform, log_rot (n,3), trans (n,3))
    """
    r_rot, r_tr = jax.random.split(rng)
    log_rot = jnp.where(
        rotation, (jax.random.uniform(r_rot, (n_samples, 3)) * 2 - 1) * 2.0,
        jnp.zeros((n_samples, 3)))
    trans = jnp.where(
        translation, (jax.random.uniform(r_tr, (n_samples, 3)) * 2 - 1) * 0.2,
        jnp.zeros((n_samples, 3)))
    ones = jnp.ones((n_samples, 1))
    return compose_transform(log_rot, trans, ones), log_rot, trans


def rotate_around_center(shapes: jnp.ndarray,
                         t: SimilarityTransform) -> jnp.ndarray:
    """Apply transforms about each cloud's centroid (affine_dgcnn.py:140-143).

    :param shapes: (B, N, 3) or (1, N, 3) broadcast against a batch of
        transforms.
    """
    center = shapes.mean(axis=-2, keepdims=True)
    return transform_points(shapes - center, t) + center
