"""Tests for the affine registration models (models/affine.py) and the
rigid-transform-recovery sanity harness (affine_experiments.py), mirroring the
reference's toy-example correctness probe (affine_dgcnn.py:165+)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.models import AFFINE_MODELS
from fissure_segmentation_tpu.models.affine import (random_transformation,
                                                     rotate_around_center)


@pytest.mark.parametrize("name", sorted(AFFINE_MODELS))
def test_affine_models_shapes(name):
    model = AFFINE_MODELS[name](k=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    rot, trans = model.apply(variables, x, train=False)
    assert rot.shape == (2, 3) and trans.shape == (2, 3)


@pytest.mark.parametrize("do_rot,do_trans", [(True, False), (False, True)])
def test_affine_disabled_component_is_zero(do_rot, do_trans):
    model = AFFINE_MODELS["PointNet"](do_rotation=do_rot,
                                      do_translation=do_trans)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    rot, trans = model.apply(variables, x, train=False)
    if not do_rot:
        assert not np.asarray(rot).any()
    if not do_trans:
        assert not np.asarray(trans).any()


def test_rotate_around_center_preserves_centroid_for_pure_rotation():
    rng = jax.random.PRNGKey(2)
    shapes = jax.random.normal(rng, (3, 50, 3)) + 5.0
    t, log_rot, trans = random_transformation(jax.random.PRNGKey(3), 3,
                                              rotation=True,
                                              translation=False)
    assert not np.asarray(trans).any()
    out = rotate_around_center(shapes, t)
    np.testing.assert_allclose(np.asarray(out.mean(1)),
                               np.asarray(shapes.mean(1)), atol=1e-4)
    # rigid: pairwise distances to centroid preserved
    r_in = jnp.linalg.norm(shapes - shapes.mean(1, keepdims=True), axis=-1)
    r_out = jnp.linalg.norm(out - out.mean(1, keepdims=True), axis=-1)
    np.testing.assert_allclose(np.asarray(r_out), np.asarray(r_in), atol=1e-4)


@pytest.mark.slow
def test_affine_experiment_learns_translation():
    """Few-epoch PointNet run must reduce translation error on the
    translation-only task (the reference uses this harness as its
    correctness probe)."""
    from affine_experiments import run_example
    hist = run_example("PointNet", epochs=8, steps_per_epoch=5,
                       out_root="/tmp/affine_test", do_rotation=False,
                       do_translation=True, use_point_loss=False,
                       use_param_loss=True, seed=0)
    first, last = hist[0]["trans_rmse_mm"], hist[-1]["trans_rmse_mm"]
    assert last < first * 0.8, (first, last)
