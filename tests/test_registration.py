import jax.numpy as jnp
import pytest
import numpy as np

from fissure_segmentation_tpu.shape_model.registration import (
    TPS, register_cpd_deformable, register_cpd_rigid, thin_plate_dense)


def test_tps_interpolates_exactly_at_controls(rng):
    c = jnp.asarray(rng.uniform(-1, 1, (30, 3)).astype(np.float32))
    f = jnp.asarray(rng.normal(size=(30, 2)).astype(np.float32))
    theta = TPS.fit(c, f, lambd=0.0)
    z = TPS.z(c, c, theta)
    np.testing.assert_allclose(np.asarray(z), np.asarray(f), atol=1e-2)


@pytest.mark.slow
def test_thin_plate_dense_shape(rng):
    x1 = jnp.asarray(rng.uniform(-0.8, 0.8, (1, 20, 3)).astype(np.float32))
    y1 = jnp.asarray(rng.normal(0, 0.05, (1, 20, 3)).astype(np.float32))
    field = thin_plate_dense(x1, y1, (16, 16, 16), step=4)
    assert field.shape == (1, 16, 16, 16, 3)
    assert np.isfinite(np.asarray(field)).all()


def _small_rotation(angle, axis=np.array([0.0, 0.0, 1.0])):
    k = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)


def test_cpd_rigid_recovers_transform(rng):
    """Parity check in the spirit of the reference's rigid toy example
    (dgssm_rigid_toy_example.py): a *structured* cloud under a small
    similarity transform (an isotropic blob has no recoverable orientation
    for any correspondence-free method)."""
    t_param = rng.uniform(0, 2 * np.pi, 120)
    y = np.stack([np.cos(t_param), np.sin(t_param), t_param / 6], 1)
    y = (y + rng.normal(0, 0.01, y.shape)).astype(np.float32)  # helix
    r_true = _small_rotation(0.1 * np.pi)
    s_true = 1.1
    t_true = np.array([0.3, -0.2, 0.1], np.float32)
    x = (s_true * y @ r_true.T + t_true).astype(np.float32)
    y_reg, (s, r, t) = register_cpd_rigid(jnp.asarray(x), jnp.asarray(y),
                                          max_iter=100)
    err = np.linalg.norm(np.asarray(y_reg) - x, axis=1).mean()
    assert err < 0.05, err
    np.testing.assert_allclose(float(s), s_true, atol=0.05)


def test_cpd_deformable_reduces_distance(rng):
    y = rng.uniform(-1, 1, (80, 3)).astype(np.float32)
    # smooth deformation of the target
    x = y + 0.2 * np.sin(y[:, :1] * 2)
    y_reg, disp = register_cpd_deformable(jnp.asarray(x), jnp.asarray(y),
                                          max_iter=60)
    d_before = np.linalg.norm(x - y, axis=1).mean()
    d_after = np.linalg.norm(x - np.asarray(y_reg), axis=1).mean()
    assert d_after < 0.3 * d_before
