import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fissure_segmentation_tpu.losses import (batch_recall_loss, chamfer_distance,
                                             cross_entropy, generalized_dice_loss,
                                             get_loss_fn, nnu_loss)


def _rand_logits(rng, b=4, n=50, c=4):
    logits = rng.normal(size=(b, n, c)).astype(np.float32)
    targets = rng.integers(0, c, size=(b, n))
    return logits, targets


def test_cross_entropy_matches_torch(rng):
    logits, targets = _rand_logits(rng)
    w = rng.uniform(0.5, 2.0, 4).astype(np.float32)
    ref = F.cross_entropy(torch.from_numpy(logits).permute(0, 2, 1),
                          torch.from_numpy(targets),
                          weight=torch.from_numpy(w)).item()
    ours, _ = cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w))
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_gdl_matches_reference_formula(rng):
    """Replicates GDL(batch_dice=True, smooth=1) from dice_loss.py:24-96."""
    logits, targets = _rand_logits(rng)
    x = torch.softmax(torch.from_numpy(logits).permute(0, 2, 1), dim=1)  # (B,C,N)
    y = F.one_hot(torch.from_numpy(targets), 4).permute(0, 2, 1).float()
    axes = [0, 2]
    tp = (x * y).sum(axes)
    fp = (x * (1 - y)).sum(axes)
    fn = ((1 - x) * y).sum(axes)
    vol = y.sum(axes) + 1e-6
    tp, fp, fn = tp / vol, fp / vol, fn / vol
    tp, fp, fn = tp.sum(0), fp.sum(0), fn.sum(0)
    ref = -((2 * tp + 1) / (2 * tp + fp + fn + 1)).mean().item()
    ours, _ = generalized_dice_loss(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_nnu_loss_components(rng):
    logits, targets = _rand_logits(rng)
    total, comps = nnu_loss(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(total), float(comps["CE"] + comps["GDL"]), rtol=1e-6)


def test_recall_loss_runs(rng):
    logits, targets = _rand_logits(rng)
    loss, _ = batch_recall_loss(jnp.asarray(logits), jnp.asarray(targets))
    assert np.isfinite(float(loss))
    # perfect prediction -> all recalls 1 -> all weights 0 -> zero-ish loss
    perfect = 100.0 * np.eye(4, dtype=np.float32)[targets]
    loss_p, _ = batch_recall_loss(jnp.asarray(perfect), jnp.asarray(targets))
    assert float(loss_p) < 1e-3


def test_chamfer_symmetric_zero(rng):
    x = jnp.asarray(rng.normal(size=(2, 30, 3)).astype(np.float32))
    assert float(chamfer_distance(x, x)) < 1e-6
    y = x + 0.1
    d = float(chamfer_distance(x, y))
    assert d > 0
    np.testing.assert_allclose(d, float(chamfer_distance(y, x)), rtol=1e-6)


def test_chamfer_masked_equals_unpadded(rng):
    x = jnp.asarray(rng.normal(size=(1, 20, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 25, 3)).astype(np.float32))
    ref = chamfer_distance(x, y)
    xp = jnp.concatenate([x, jnp.full((1, 12, 3), 1e6)], axis=1)
    yp = jnp.concatenate([y, jnp.full((1, 7, 3), -1e6)], axis=1)
    xm = jnp.arange(32)[None] < 20
    ym = jnp.arange(32)[None] < 25
    got = chamfer_distance(xp, yp, x_mask=xm, y_mask=ym)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_registry_dispatch(rng):
    logits, targets = _rand_logits(rng)
    for name in ("nnunet", "ce", "recall"):
        fn = get_loss_fn(name)
        loss, comps = fn(jnp.asarray(logits), jnp.asarray(targets))
        assert np.isfinite(float(loss))
    try:
        get_loss_fn("nope")
        raise AssertionError("should have raised")
    except ValueError:
        pass
