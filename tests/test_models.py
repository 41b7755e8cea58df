import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.models import (DGCNNReg, DGCNNSeg, PointNetSeg,
                                             ensemble_predict, load_model,
                                             save_model)


def _init(model, n=64, c=3, b=2, rng_seed=0):
    x = jax.random.normal(jax.random.PRNGKey(rng_seed), (b, n, c))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    return x, variables


@pytest.mark.parametrize("dynamic", [True, False])
def test_dgcnn_seg_shapes(dynamic):
    model = DGCNNSeg(k=8, in_features=3, num_classes=4, dynamic=dynamic)
    x, variables = _init(model)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64, 4)
    # train mode mutates batch_stats
    out2, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out2.shape == (2, 64, 4)
    assert "batch_stats" in mutated


def test_dgcnn_seg_with_modules():
    model = DGCNNSeg(k=8, in_features=8, num_classes=4, dynamic=False,
                     spatial_transformer=True, image_feat_module=True)
    x, variables = _init(model, c=8)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64, 4)


def test_spatial_transformer_identity_at_init():
    """Zero-kernel + identity-bias init -> transform is identity at step 0
    (parity with dgcnn.py:277-279 init)."""
    from fissure_segmentation_tpu.models.dgcnn import SpatialTransformer
    st = SpatialTransformer(k=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 5))
    variables = st.init(jax.random.PRNGKey(1), x, train=False)
    out = st.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_dgcnn_reg_shapes():
    model = DGCNNReg(k=8, in_features=3, num_classes=7)
    x, variables = _init(model)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 7)


def test_pointnet_seg_shapes():
    model = PointNetSeg(in_features=3, num_classes=4, spatial_transform=True)
    x, variables = _init(model)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64, 4)


def test_save_load_roundtrip(tmp_path):
    model = DGCNNSeg(k=8, in_features=3, num_classes=4, dynamic=False)
    x, variables = _init(model)
    ref = model.apply(variables, x, train=False)
    path = str(tmp_path / "model.fst")
    save_model(model, variables, path)
    model2, variables2 = load_model(path)
    assert model2 == model
    out = model2.apply(variables2, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_save_load_roundtrip_amp_dtype(tmp_path):
    """A bf16 compute-dtype field (from --amp) must survive the JSON header
    (encoded as {"__dtype__": "bfloat16"}, not a raw type object)."""
    import jax.numpy as jnp
    model = DGCNNSeg(k=8, in_features=3, num_classes=4, dynamic=False,
                     dtype=jnp.bfloat16)
    x, variables = _init(model)
    path = str(tmp_path / "model_amp.fst")
    save_model(model, variables, path)
    model2, variables2 = load_model(path)
    assert np.dtype(model2.dtype) == np.dtype(jnp.bfloat16)
    out = model2.apply(variables2, x, train=False)
    ref = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_ensemble_predict_covers_all_points():
    model = PointNetSeg(in_features=3, num_classes=3)
    x, variables = _init(model, n=32, b=1)
    pc = jax.random.normal(jax.random.PRNGKey(5), (200, 3))
    probs = ensemble_predict(model.apply, variables, pc, jax.random.PRNGKey(0),
                             sample_points=32, n_runs_min=10, subset_batch=5)
    assert probs.shape == (200, 3)
    s = np.asarray(probs.sum(-1))
    np.testing.assert_allclose(s, 1.0, atol=1e-5)
    # every point must have been seen: the accumulator softmax of an unseen
    # point would be uniform — check probabilities are not all uniform
    assert not np.allclose(np.asarray(probs), 1 / 3, atol=1e-4)
