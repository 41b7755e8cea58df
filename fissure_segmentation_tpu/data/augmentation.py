"""On-device point-cloud augmentation.

Counterpart of reference augmentations.py:52-113 (`point_augmentation`,
`compose_transform`, `transform_points`): a random similarity transform in
grid coordinates — rotation by a *fixed* angle ``rotation_amount*pi`` around a
random axis, uniform scale in ``[1 - scale_amount, 1]`` and translation in
``[-translation_amount, translation_amount]``. Runs under jit inside the
train step (no host round-trip per batch).

Transforms are represented as ``(R, s, t)`` with row-vector convention
``p' = (p @ R) * s + t`` (pytorch3d Transform3d rotate->scale->translate).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SimilarityTransform(NamedTuple):
    rotation: jnp.ndarray     # (..., 3, 3)
    scaling: jnp.ndarray      # (..., 1) or (..., 3)
    translation: jnp.ndarray  # (..., 3)


def so3_exp_map(log_rot: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula; (..., 3) axis-angle -> (..., 3, 3) rotation.

    Matches pytorch3d.transforms.so3_exp_map (row-vector convention users
    multiply as p @ R).
    """
    theta = jnp.linalg.norm(log_rot, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    safe = jnp.maximum(theta, 1e-8)
    axis = log_rot / jnp.maximum(jnp.linalg.norm(log_rot, axis=-1, keepdims=True), 1e-8)
    zeros = jnp.zeros_like(axis[..., 0])
    k = jnp.stack([
        jnp.stack([zeros, -axis[..., 2], axis[..., 1]], axis=-1),
        jnp.stack([axis[..., 2], zeros, -axis[..., 0]], axis=-1),
        jnp.stack([-axis[..., 1], axis[..., 0], zeros], axis=-1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=log_rot.dtype), k.shape)
    r = eye + jnp.sin(safe) * k + (1 - jnp.cos(safe)) * (k @ k)
    return jnp.where(theta > 1e-8, r, eye)


def so3_log_map(r: jnp.ndarray) -> jnp.ndarray:
    """Inverse of so3_exp_map; (..., 3, 3) rotation -> (..., 3) axis-angle.

    Counterpart of pytorch3d so3_log_map used by the reference's
    CorrespondingPointDataset target construction (data.py:550-575).
    """
    cos = (jnp.trace(r, axis1=-2, axis2=-1) - 1) / 2
    theta = jnp.arccos(jnp.clip(cos, -1 + 1e-7, 1 - 1e-7))[..., None]
    # skew part of R gives sin(theta) * axis
    w = jnp.stack([r[..., 2, 1] - r[..., 1, 2],
                   r[..., 0, 2] - r[..., 2, 0],
                   r[..., 1, 0] - r[..., 0, 1]], axis=-1) / 2
    sin = jnp.sin(theta)
    axis = w / jnp.maximum(sin, 1e-8)
    return jnp.where(theta > 1e-6, axis * theta, w)  # small angle: log ≈ skew vector


def invert_transform(t: SimilarityTransform) -> SimilarityTransform:
    """Inverse of p' = (p @ R) * s + t: p = ((p' - t) / s) @ R^T."""
    r_inv = jnp.swapaxes(t.rotation, -1, -2)
    s_inv = 1.0 / t.scaling
    t_inv = -jnp.einsum("...c,...cd->...d", t.translation * s_inv, r_inv)
    return SimilarityTransform(r_inv, s_inv, t_inv)


def chain_transforms(a: SimilarityTransform, b: SimilarityTransform) -> SimilarityTransform:
    """Transform equivalent to applying `a` then `b` (isotropic scaling).

    p'' = ((p @ Ra) sa + ta) @ Rb * sb + tb
        = p @ (Ra Rb) * (sa sb) + (ta @ Rb) * sb + tb
    """
    rot = a.rotation @ b.rotation
    scale = a.scaling * b.scaling
    trans = jnp.einsum("...c,...cd->...d", a.translation, b.rotation) * b.scaling \
        + b.translation
    return SimilarityTransform(rot, scale, trans)


def transform_matrix(t: SimilarityTransform) -> jnp.ndarray:
    """(..., 4, 4) homogeneous matrix, row-vector convention ([p 1] @ M)."""
    rs = t.rotation * t.scaling[..., None, :] if t.scaling.shape[-1] == 3 \
        else t.rotation * t.scaling[..., None]
    batch = rs.shape[:-2]
    m = jnp.zeros((*batch, 4, 4), rs.dtype)
    m = m.at[..., :3, :3].set(rs)
    m = m.at[..., 3, :3].set(t.translation)
    m = m.at[..., 3, 3].set(1.0)
    return m


def decompose_similarity_transform(t: SimilarityTransform):
    """(log_rotation (...,3), translation (...,3), scaling (...,1)) of a
    similarity transform — the reference's 7-dof affine target vector
    (data.py:575-585: so3_log + translation + scale)."""
    scale = t.scaling if t.scaling.shape[-1] == 1 else t.scaling[..., :1]
    return so3_log_map(t.rotation), t.translation, scale


def compose_transform(log_rotation: jnp.ndarray, translation: jnp.ndarray,
                      scaling: jnp.ndarray) -> SimilarityTransform:
    """(reference augmentations.py:78-95)"""
    return SimilarityTransform(so3_exp_map(log_rotation), scaling, translation)


def transform_points(points: jnp.ndarray, t: SimilarityTransform) -> jnp.ndarray:
    """Apply p' = (p @ R) * s + t; points (..., N, 3) (augmentations.py:105-113,
    channel-last here)."""
    rotated = jnp.einsum("...nc,...cd->...nd", points, t.rotation)
    return rotated * t.scaling[..., None, :] + t.translation[..., None, :]


def random_transform(rng: jax.Array, batch_shape=(),
                     rotation_amount: float = 0.1,
                     translation_amount: float = 0.1,
                     scale_amount: float = 0.1) -> SimilarityTransform:
    r_axis, r_trans, r_scale = jax.random.split(rng, 3)
    v = jax.random.uniform(r_axis, (*batch_shape, 3)) * 2 - 1
    axis = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    log_rot = axis * jnp.pi * rotation_amount
    translation = (jax.random.uniform(r_trans, (*batch_shape, 3)) * 2 - 1) * translation_amount
    scaling = 1.0 - jax.random.uniform(r_scale, (*batch_shape, 1)) * scale_amount
    return compose_transform(log_rot, translation, scaling)


def point_augmentation(rng: jax.Array, point_clouds: jnp.ndarray,
                       rotation_amount: float = 0.1,
                       translation_amount: float = 0.1,
                       scale_amount: float = 0.1):
    """Random similarity augmentation of (B, N, 3) clouds
    (augmentations.py:52-75)."""
    t = random_transform(rng, point_clouds.shape[:-2],
                         rotation_amount, translation_amount, scale_amount)
    return transform_points(point_clouds, t), t
