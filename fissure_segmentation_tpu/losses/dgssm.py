"""DG-SSM loss: Chamfer(points) + MSE(coefficients) + MSE(affine params).

Counterpart of reference losses/dgssm_loss.py:6-50: the target shape is
transformed into the moving (augmented) space with the target affine params
before the point loss.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..data.augmentation import compose_transform, transform_points
from .chamfer import chamfer_distance

DEFAULT_W_POINT = 1.0
DEFAULT_W_COEFFICIENTS = 0.5
DEFAULT_W_AFFINE = 0.5


def corresponding_point_distance(prediction, target):
    """(dgssm_loss.py:50-51)"""
    return jnp.sqrt(jnp.sum((prediction - target) ** 2, axis=-1))


def make_dgssm_loss(w_point: float = DEFAULT_W_POINT,
                    w_coefficients: float = DEFAULT_W_COEFFICIENTS,
                    w_affine: float = DEFAULT_W_AFFINE):
    def loss(prediction, target):
        pred_shape, pred_weights, pred_affine = prediction
        targ_shape, targ_weights, targ_affine = target

        rot, trans, scale = (targ_affine[:, :3], targ_affine[:, 3:6],
                             targ_affine[:, 6:9])
        targ_moving = transform_points(targ_shape,
                                       compose_transform(rot, trans, scale))

        point_loss = chamfer_distance(pred_shape, targ_moving)
        coeff_loss = jnp.mean((pred_weights - targ_weights) ** 2)
        total = w_point * point_loss + w_coefficients * coeff_loss
        comps = {"Point-Loss": point_loss, "Coefficients": coeff_loss}
        if w_affine:
            affine_loss = jnp.mean((pred_affine - targ_affine) ** 2)
            comps["Affine-Params"] = affine_loss
            total = total + w_affine * affine_loss
        return total, comps

    return loss
