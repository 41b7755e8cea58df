"""Point/voxel segmentation losses: CE, generalized Dice, nnU-Net combo, recall.

Pure-function counterparts of reference losses/nnu_loss.py:6-20,
losses/dice_loss.py:24-152 (GDL with batch_dice=True, do_bg=True, smooth=1,
square=False) and losses/recall_loss.py:9-27.

All take channel-last logits (B, ..., C) and integer targets (B, ...). Every
loss returns ``(scalar, components_dict)`` so the trainer can log components
(model_trainer.py:149-152 parity).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _onehot(targets: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                  class_weights: jnp.ndarray | None = None):
    """torch.nn.CrossEntropyLoss semantics: weighted mean with weight
    normalization sum(w_y)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if class_weights is None:
        ce = nll.mean()
    else:
        w = class_weights[targets]
        # guard: all-zero weights (e.g. recall loss with perfect prediction)
        # would give 0/0; torch returns nan here, we return 0.
        ce = (w * nll).sum() / jnp.maximum(w.sum(), 1e-12)
    return ce, {"CE": ce}


def generalized_dice_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                          batch_dice: bool = True, smooth: float = 1.0,
                          apply_softmax: bool = True):
    """GDL (dice_loss.py:24-96): 1/V-weighted soft dice, returns -dice."""
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1) if apply_softmax else logits
    y = _onehot(targets, num_classes)
    # sum over batch (if batch_dice) and all spatial dims -> per-class scalars
    axes = tuple(i for i in range(probs.ndim - 1)) if batch_dice \
        else tuple(range(1, probs.ndim - 1))
    tp = jnp.sum(probs * y, axis=axes)
    fp = jnp.sum(probs * (1 - y), axis=axes)
    fn = jnp.sum((1 - probs) * y, axis=axes)
    volumes = jnp.sum(y, axis=axes) + 1e-6
    tp, fp, fn = tp / volumes, fp / volumes, fn / volumes
    # sum over classes (axis 0 of the per-class vector when batch_dice)
    sum_axis = 0 if batch_dice else 1
    tp = tp.sum(sum_axis)
    fp = fp.sum(sum_axis)
    fn = fn.sum(sum_axis)
    dc = (2 * tp + smooth) / (2 * tp + fp + fn + smooth)
    gdl = -dc.mean()
    return gdl, {"GDL": gdl}


def nnu_loss(logits: jnp.ndarray, targets: jnp.ndarray,
             class_weights: jnp.ndarray | None = None,
             w_dice: float = 1.0, w_ce: float = 1.0):
    """nnU-Net loss: CE + GDL (nnu_loss.py:6-20). Note the reference ignores
    w_dice/w_ce in the sum (returns ce + dice) — we honor the weights."""
    ce, _ = cross_entropy(logits, targets, class_weights)
    gdl, _ = generalized_dice_loss(logits, targets)
    return w_ce * ce + w_dice * gdl, {"CE": ce, "GDL": gdl}


def batch_recall_loss(logits: jnp.ndarray, targets: jnp.ndarray):
    """CE weighted by the per-class false-negative rate of the current batch
    (recall_loss.py:9-27). The weights are computed per batch *item* then
    averaged over the batch, without gradient flow."""
    num_classes = logits.shape[-1]
    pred = jnp.argmax(logits, axis=-1)
    pred_1h = _onehot(pred, num_classes)       # (B, ..., C)
    targ_1h = _onehot(targets, num_classes)
    reduce_axes = tuple(range(1, targets.ndim))  # per-batch-item reduction
    tp = jnp.sum(pred_1h * targ_1h, axis=reduce_axes)          # (B, C)
    fn = jnp.sum((1 - pred_1h) * targ_1h, axis=reduce_axes)
    recall = (tp + 1e-4) / (tp + fn + 1e-4)  # eps parity metrics.py:144-148
    weight = jax.lax.stop_gradient(1.0 - recall.mean(0))       # (C,)
    loss, _ = cross_entropy(logits, targets, weight)
    return loss, {"Recall-CE": loss}
