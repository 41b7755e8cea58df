"""DPSR training loss: segmentation (CE+GDL) + epoch-gated mesh Chamfer.

Counterpart of reference losses/dpsr_loss.py:9-44. Predictions/targets are
(seg_logits, surface_point_samples): in the fixed-shape TPU pipeline the
predicted mesh is a padded triangle soup already sampled to points by the
model (models/dpsr_net.py), and targets are dense GT surface samples — so the
mesh term is a masked Chamfer between point sets.
"""
from __future__ import annotations

import jax.numpy as jnp

from .chamfer import chamfer_distance
from .segmentation import nnu_loss

DEFAULT_W_SEG = 0.5
DEFAULT_W_CHAMFER = 0.5
DEFAULT_EPOCH_START_CHAMFER = 0.1


def make_dpsr_loss(class_weights=None, w_seg: float = DEFAULT_W_SEG,
                   w_mesh: float = DEFAULT_W_CHAMFER,
                   epoch_start_mesh_loss: float = DEFAULT_EPOCH_START_CHAMFER):
    def loss(prediction, target, current_epoch_fraction: float = 1.0):
        pred_seg, pred_surface_pts, pred_valid = prediction
        targ_seg, targ_surface_pts = target[0], target[1]
        targ_valid = target[2] if len(target) > 2 else None

        seg, _ = nnu_loss(pred_seg, targ_seg, class_weights)
        use_mesh = (current_epoch_fraction >= epoch_start_mesh_loss) and w_mesh > 0
        if use_mesh:
            cham = chamfer_distance(pred_surface_pts, targ_surface_pts,
                                    x_mask=pred_valid, y_mask=targ_valid)
            total = w_seg * seg + w_mesh * cham
        else:
            cham = jnp.asarray(0.0)
            total = seg
        return total, {"Segmentation": seg, "Chamfer": cham}

    return loss
