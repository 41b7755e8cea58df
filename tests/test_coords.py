import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.utils.coords import kpts_to_grid, kpts_to_world


def test_roundtrip(rng):
    shape = (97, 128, 115)
    d, h, w = shape
    pts = rng.uniform(0, 1, (100, 3)).astype(np.float32) * np.array([w - 1, h - 1, d - 1], np.float32)
    grid = kpts_to_grid(jnp.asarray(pts), shape)
    back = kpts_to_world(grid, shape)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-3)


def test_matches_torch_reference_semantics(rng):
    """Bit-parity with the reference formula (general_utils.py:105-148)."""
    import torch
    shape = (64, 80, 96)
    d, h, w = shape
    pts = rng.uniform(0, 1, (50, 3)).astype(np.float32) * np.array([w - 1, h - 1, d - 1], np.float32)

    # reference formula, align_corners=False
    t = torch.from_numpy(pts)
    size = torch.tensor([w, h, d]).float()
    ref = (t / (size - 1) * 2 - 1) * ((size - 1) / size)

    ours = kpts_to_grid(jnp.asarray(pts), shape)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def test_align_corners_true():
    shape = (10, 10, 10)
    corner = jnp.array([[0.0, 0.0, 0.0], [9.0, 9.0, 9.0]])
    g = kpts_to_grid(corner, shape, align_corners=True)
    np.testing.assert_allclose(np.asarray(g), [[-1, -1, -1], [1, 1, 1]], atol=1e-6)
