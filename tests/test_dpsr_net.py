"""DPSR-Net model tests: v1 (per-class extraction + estimated normals,
reference models/dpsr_net.py:107-185) and v2 (SoftMesh logit splatting,
seg_logits_to_mesh.py:14-116)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.models.dpsr_net import (
    DPSRNet, DPSRNet2, per_class_surface_samples)


def _plane_logits_and_coords(rng, n=400):
    """Points in [-0.8, 0.8]^3; class 1 = points with x < 0 (a plane-ish
    half-space whose boundary the PSR should reconstruct)."""
    coords = jnp.asarray(rng.uniform(-0.8, 0.8, (1, n, 3)).astype(np.float32))
    labels = (coords[..., 0] < 0).astype(jnp.int32)  # (1, N) in {0, 1}
    logits = jax.nn.one_hot(labels, 2) * 10.0
    return logits, coords


@pytest.mark.slow
def test_per_class_surface_samples_shapes_and_validity(rng):
    logits, coords = _plane_logits_and_coords(rng)
    pts, valid, psr = per_class_surface_samples(
        logits, coords, jax.random.PRNGKey(0), res=(24, 24, 24),
        dpsr_sigma=3.0, n_surface_samples=256, max_tris=20000)
    assert pts.shape == (1, 1, 256, 3)
    assert valid.shape == (1, 1, 256)
    assert psr.shape == (1, 1, 24, 24, 24)
    assert bool(valid.any())
    assert np.isfinite(np.asarray(pts)).all()
    # surface samples hug the class-1 point region (x < 0 half)
    p = np.asarray(pts)[0, 0][np.asarray(valid)[0, 0]]
    assert p[:, 0].mean() < 0.1


def test_per_class_empty_class_is_invalid(rng):
    """A class the argmax never predicts yields valid=False, not NaNs."""
    coords = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 100, 3)).astype(np.float32))
    logits = jnp.zeros((1, 100, 3)).at[..., 0].set(10.0)  # all background
    pts, valid, psr = per_class_surface_samples(
        logits, coords, jax.random.PRNGKey(0), res=(16, 16, 16),
        n_surface_samples=64, max_tris=2000)
    assert not bool(valid.any())
    assert np.isfinite(np.asarray(psr)).all()
    assert np.isfinite(np.asarray(pts)).all()


@pytest.mark.parametrize("cls", [DPSRNet, DPSRNet2])
@pytest.mark.slow
def test_dpsr_net_train_step(cls, rng):
    """One fwd+bwd step through the full model: gradients exist and are
    finite for both variants."""
    model = cls(seg_net_class="DGCNN", k=8, in_features=3, num_classes=3,
                dynamic=False, dpsr_res=(16, 16, 16), dpsr_sigma=3.0,
                max_tris=4000, n_surface_samples=128)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 128, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, (2, 128)))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rng=jax.random.PRNGKey(1),
            mutable=["batch_stats"])
        seg_logits, pts, valid = out
        ce = -jnp.mean(jnp.take_along_axis(
            jax.nn.log_softmax(seg_logits), y[..., None], axis=-1))
        surf = jnp.sum(jnp.where(valid[..., None], pts, 0.0) ** 2) * 1e-3
        return ce + surf

    l, g = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(l))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(float(jnp.abs(x).sum()) > 0 for x in leaves)
