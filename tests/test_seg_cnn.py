import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.models.seg_cnn import (MobileNetASPP,
                                                     gaussian_importance_map,
                                                     get_patch_starts,
                                                     predict_all_patches,
                                                     predict_full_volume)


def test_patch_starts_invariants():
    """Reference unit test parity (models/test_seg_cnn.py:6-35): patches
    cover the full image and respect the minimum overlap."""
    cases = [((128, 128, 128), (64, 64, 64)), ((100, 90, 80), (64, 64, 64)),
             ((64, 64, 64), (64, 64, 64)), ((50, 200, 65), (64, 64, 64)),
             ((128, 128, 128), (96, 96, 96)), ((31, 31, 31), (64, 64, 64))]
    for img_size, patch in cases:
        for overlap in (0.25, 0.5):
            starts = get_patch_starts(img_size, overlap, patch)
            for d in range(3):
                s = starts[d]
                # full coverage
                assert s[0] == 0
                assert s[-1] + patch[d] >= img_size[d]
                # min overlap respected between consecutive patches
                for a, b in zip(s, s[1:]):
                    assert b - a <= patch[d] * (1 - overlap) + 1


def test_gaussian_importance_map():
    g = gaussian_importance_map((32, 32, 32))
    assert g.shape == (32, 32, 32)
    assert g.max() == g[16, 16, 16]
    assert (g > 0).all()


@pytest.mark.slow
def test_mobilenet_aspp_shapes():
    model = MobileNetASPP(num_classes=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 32, 1))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 32, 32, 32, 4)
    # training step with remat + dropout + BN
    out2, mut = model.apply(variables, x, train=True,
                            mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(2)})
    assert out2.shape == (1, 32, 32, 32, 4)
    g = jax.grad(lambda v: model.apply(
        {"params": v, "batch_stats": variables["batch_stats"]}, x, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)}
    )[0].sum())(variables["params"])
    from jax.flatten_util import ravel_pytree
    assert np.isfinite(np.asarray(ravel_pytree(g)[0])).all()


@pytest.mark.slow
def test_patch_based_inference():
    model = MobileNetASPP(num_classes=3)
    x32 = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 32, 1))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x32, train=False)
    img = jax.random.normal(jax.random.PRNGKey(2), (40, 36, 48))
    out = predict_all_patches(model.apply, variables, img, 3,
                              patch_size=(32, 32, 32), min_overlap=0.25)
    assert out.shape == (40, 36, 48, 3)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.slow
def test_full_volume_inference():
    """predict_full_volume == softmax(direct forward) incl. the pad/crop
    plumbing for dims that aren't multiples of the backbone stride."""
    model = MobileNetASPP(num_classes=3)
    x32 = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 32, 1))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x32, train=False)

    # non-multiple-of-4 dims exercise the edge padding + crop
    img = jax.random.normal(jax.random.PRNGKey(2), (30, 33, 35))
    out = predict_full_volume(model.apply, variables, img)
    assert out.shape == (30, 33, 35, 3)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)

    # stride-aligned volume: must equal the direct forward exactly
    img2 = jax.random.normal(jax.random.PRNGKey(3), (32, 32, 32))
    out2 = predict_full_volume(model.apply, variables, img2)
    ref = jax.nn.softmax(
        model.apply(variables, img2[None, ..., None], train=False)[0], -1)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-6)

    # single-patch sliding window covers the same field of view -> the two
    # inference protocols must agree on the argmax everywhere
    sw = predict_all_patches(model.apply, variables, img2, 3,
                             patch_size=(32, 32, 32))
    assert (np.asarray(out2.argmax(-1)) == np.asarray(sw.argmax(-1))).all()
