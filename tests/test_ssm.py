import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.losses.dgssm import make_dgssm_loss
from fissure_segmentation_tpu.models.dg_ssm import DGSSM, dgssm_ensemble_predict
from fissure_segmentation_tpu.shape_model import (fit_ssm, load_ssm, save_ssm,
                                                  ssm_decode, ssm_project,
                                                  ssm_random_samples)


def _make_shapes(rng, n=20, p=50, modes=3):
    """Shapes = mean + low-rank variation (exactly `modes` modes)."""
    base = rng.normal(size=(p, 3)).astype(np.float32)
    dirs = rng.normal(size=(modes, p, 3)).astype(np.float32)
    w = rng.normal(size=(n, modes)).astype(np.float32)
    return base[None] + np.einsum("nm,mpc->npc", w, dirs) * 0.1


def test_ssm_fit_encode_decode_roundtrip(rng):
    """Reference test vector: ssm.py:213-243 __main__ (fit -> encode/decode
    -> save/load -> allclose)."""
    shapes = _make_shapes(rng)
    ssm = fit_ssm(shapes, alpha=3.0, target_variance=0.99)
    assert 1 <= ssm.num_modes <= 19
    x = jnp.asarray(shapes[:5])
    w = ssm_project(ssm, x)
    rec = ssm_decode(ssm, w)
    # data is exactly low-rank -> near-perfect reconstruction
    err = np.abs(np.asarray(rec) - shapes[:5]).max()
    assert err < 1e-3, err


def test_ssm_save_load_roundtrip(rng, tmp_path):
    shapes = _make_shapes(rng)
    ssm = fit_ssm(shapes)
    p = str(tmp_path / "ssm.npz")
    save_ssm(ssm, p)
    ssm2 = load_ssm(p)
    np.testing.assert_allclose(np.asarray(ssm.eigenvectors),
                               np.asarray(ssm2.eigenvectors))
    s = ssm_random_samples(ssm2, jax.random.PRNGKey(0), 4)
    assert s.shape == (4, ssm2.num_modes)
    ranges = 3.0 * np.sqrt(np.asarray(ssm2.eigenvalues))
    assert (np.abs(np.asarray(s)) <= ranges + 1e-5).all()


@pytest.mark.slow
def test_dgssm_forward_and_loss(rng):
    shapes = _make_shapes(rng, n=10, p=36)
    ssm = fit_ssm(shapes, target_variance=0.99)
    model = DGSSM(k=6, in_features=3, ssm_modes=ssm.num_modes, dynamic=False)
    x = jnp.asarray(shapes[:2])
    variables = model.init(jax.random.PRNGKey(0), x, ssm, train=False)
    recon, weights, affine = model.apply(variables, x, ssm, train=False)
    assert recon.shape == (2, 36, 3)
    assert weights.shape == (2, ssm.num_modes)
    assert affine.shape == (2, 9)

    loss_fn = make_dgssm_loss()
    targ_affine = jnp.concatenate([jnp.zeros((2, 6)), jnp.ones((2, 3))], -1)
    total, comps = loss_fn((recon, weights, affine),
                           (x, ssm_project(ssm, x), targ_affine))
    assert np.isfinite(float(total))
    assert set(comps) == {"Point-Loss", "Coefficients", "Affine-Params"}


def test_dgssm_head_gating(rng):
    shapes = _make_shapes(rng, n=8, p=25)
    ssm = fit_ssm(shapes, target_variance=0.99)
    model = DGSSM(k=4, in_features=3, ssm_modes=ssm.num_modes,
                  active_heads=("main",))
    x = jnp.asarray(shapes[:2])
    variables = model.init(jax.random.PRNGKey(0), x, ssm, train=False)
    _, _, affine = model.apply(variables, x, ssm, train=False)
    np.testing.assert_allclose(np.asarray(affine[:, :6]), 0.0)  # rot+trans off
    np.testing.assert_allclose(np.asarray(affine[:, 6:]), 1.0)  # scaling off -> ones


def test_dgssm_ensemble_predict(rng):
    shapes = _make_shapes(rng, n=8, p=25)
    ssm = fit_ssm(shapes, target_variance=0.99)
    model = DGSSM(k=4, in_features=3, ssm_modes=ssm.num_modes)
    pc = jnp.asarray(shapes[:2])
    variables = model.init(jax.random.PRNGKey(0), pc, ssm, train=False)
    recon, w, a = dgssm_ensemble_predict(model.apply, variables, ssm, pc,
                                         jax.random.PRNGKey(1),
                                         sample_points=16, n_runs_min=4)
    assert recon.shape == (2, 25, 3)
    assert w.shape == (2, ssm.num_modes) and a.shape == (2, 9)
