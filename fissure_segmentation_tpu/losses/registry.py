"""Loss registry (reference losses/access_losses.py:16-93).

`get_loss_fn` returns a pure callable ``loss(prediction, target) ->
(scalar, components_dict)`` closed over configuration (class weights, term
weights), suitable for use inside a jitted train step.
"""
from __future__ import annotations

import enum
import functools
from typing import Sequence

from .chamfer import chamfer_loss
from .segmentation import batch_recall_loss, cross_entropy, nnu_loss


class Losses(enum.Enum):
    NNUNET = "nnunet"
    CE = "ce"
    RECALL = "recall"
    SSM = "ssm"
    CHAMFER = "chamfer"
    MESH = "mesh"
    DPSR = "dpsr"

    @classmethod
    def list(cls):
        return [c.value for c in cls]


def get_loss_fn(loss, class_weights=None, term_weights: Sequence[float] | None = None):
    if isinstance(loss, Losses):
        loss = loss.value

    if loss == Losses.NNUNET.value:
        return functools.partial(nnu_loss, class_weights=class_weights)
    if loss == Losses.CE.value:
        return functools.partial(cross_entropy, class_weights=class_weights)
    if loss == Losses.RECALL.value:
        return batch_recall_loss
    if loss == Losses.CHAMFER.value:
        return chamfer_loss
    if loss == Losses.SSM.value:
        from .dgssm import make_dgssm_loss
        if term_weights is not None:
            assert len(term_weights) == 3
            return make_dgssm_loss(w_point=term_weights[0],
                                   w_coefficients=term_weights[1],
                                   w_affine=term_weights[2])
        return make_dgssm_loss()
    if loss == Losses.MESH.value:
        from .mesh import make_regularized_mesh_loss
        if term_weights is not None:
            assert len(term_weights) == 4
            return make_regularized_mesh_loss(w_chamfer=term_weights[0],
                                              w_edge_length=term_weights[1],
                                              w_normal_consistency=term_weights[2],
                                              w_laplacian=term_weights[3])
        return make_regularized_mesh_loss()
    if loss == Losses.DPSR.value:
        from .dpsr import make_dpsr_loss
        if term_weights is not None:
            assert len(term_weights) == 3
            return make_dpsr_loss(class_weights, w_seg=term_weights[0],
                                  w_mesh=term_weights[1],
                                  epoch_start_mesh_loss=term_weights[2])
        return make_dpsr_loss(class_weights)

    raise ValueError(
        f'No loss function named "{loss}". Choose one of {Losses.list()}.')
