"""DG-SSM: DGCNN regression of statistical-shape-model coefficients + affine.

Counterpart of reference models/dg_ssm.py:91-167 (`DGSSM`): a multi-head
classification DGCNN predicts SSM mode *coefficients* (multipliers of the
eigenvalues), an so3 rotation vector, translation and scaling; the shape is
decoded from the SSM and similarity-transformed.

The SSM itself is a frozen pytree (shape_model/ssm.py) fitted *before* SGD;
it is passed to the module call rather than stored as parameters, keeping
the flax module purely functional. `DGSSM.bind_ssm` returns an apply-
compatible callable for the generic trainer.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.augmentation import compose_transform, transform_points
from ..shape_model.ssm import SSMParams, ssm_decode
from .dgcnn_cls import MultiHeadDGCNN


class DGSSM(nn.Module):
    """(dg_ssm.py:91-138). Call returns (reconstruction (B, P, 3),
    pred_weights (B, M), affine (B, 9) = [rot | trans | scale])."""
    k: int
    in_features: int
    ssm_modes: int
    dynamic: bool = True
    predict_affine_params: bool = True
    only_affine: bool = False
    dropout: float = 0.0
    active_heads: Tuple[str, ...] = ("main", "translation", "rotation", "scaling")

    @nn.compact
    def __call__(self, x: jnp.ndarray, ssm: SSMParams, train: bool = False):
        main, heads = MultiHeadDGCNN(
            k=self.k, output_channels_main=self.ssm_modes,
            dropout=self.dropout, static=not self.dynamic,
            active_heads=self.active_heads)(x, train)

        if not self.only_affine:
            pred_weights = main * ssm.eigenvalues  # coefficients scale eigenvalues
        else:
            pred_weights = jnp.zeros_like(main)
        recon = ssm_decode(ssm, pred_weights)

        if self.predict_affine_params or self.only_affine:
            rot, trans, scale = heads["rotation"], heads["translation"], heads["scaling"]
            recon = transform_points(recon, compose_transform(rot, trans, scale))
        else:
            b = x.shape[0]
            rot = jnp.zeros((b, 3)); trans = jnp.zeros((b, 3))
            scale = jnp.ones((b, 3))
        affine = jnp.concatenate([rot, trans, scale], axis=-1)
        return recon, pred_weights, affine


def dgssm_ensemble_predict(apply_fn, variables, ssm: SSMParams, pc: jnp.ndarray,
                           rng: jax.Array, sample_points: int = 1024,
                           n_runs_min: int = 50):
    """Mean-accumulated full-cloud prediction (dg_ssm.py:66-88): averages
    coefficients and affine params over random subsets, then decodes once.

    :param pc: (B, N, C) full clouds
    :return: (recon, weights, affine) from the averaged parameters
    """
    b, n, c = pc.shape
    rngs = jax.random.split(rng, n_runs_min)

    def body(acc, r):
        w_acc, a_acc = acc
        perm = jax.random.permutation(r, n)[:sample_points]
        _, w, a = apply_fn(variables, pc[:, perm], ssm, train=False)
        return (w_acc + w, a_acc + a), None

    m = ssm.num_modes
    (w_acc, a_acc), _ = jax.lax.scan(
        body, (jnp.zeros((b, m)), jnp.zeros((b, 9))), rngs)
    w = w_acc / n_runs_min
    a = a_acc / n_runs_min
    recon = ssm_decode(ssm, w)
    rot, trans, scale = a[:, :3], a[:, 3:6], a[:, 6:9]
    recon = transform_points(recon, compose_transform(rot, trans, scale))
    return recon, w, a
