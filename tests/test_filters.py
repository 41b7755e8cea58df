import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fissure_segmentation_tpu.utils import filters


def _torch_filter_1d(img, weight, dim, padding_mode="replicate"):
    """Reference implementation (utils/image_utils.py:6-19)."""
    B, C, D, H, W = img.shape
    N = weight.shape[0]
    padding = torch.zeros(6)
    padding[[4 - 2 * dim, 5 - 2 * dim]] = N // 2
    padding = padding.long().tolist()
    view = torch.ones(5)
    view[dim + 2] = -1
    view = view.long().tolist()
    return F.conv3d(F.pad(img.view(B * C, 1, D, H, W), padding, mode=padding_mode),
                    weight.view(view)).view(B, C, D, H, W)


def test_filter_1d_matches_reference(rng):
    img = rng.normal(size=(10, 12, 14)).astype(np.float32)
    w = rng.normal(size=5).astype(np.float32)
    for dim in range(3):
        ref = _torch_filter_1d(torch.from_numpy(img)[None, None], torch.from_numpy(w), dim)
        ours = filters.filter_1d(jnp.asarray(img), jnp.asarray(w), dim)
        np.testing.assert_allclose(np.asarray(ours), ref[0, 0].numpy(), atol=1e-5)


def test_smooth_matches_reference(rng):
    img = rng.normal(size=(9, 11, 13)).astype(np.float32)
    sigma = 1.3
    t = torch.from_numpy(img)[None, None]
    N = int(torch.ceil(torch.tensor(sigma) * 3.0 / 2.0).item()) * 2 + 1
    weight = torch.exp(-torch.pow(torch.linspace(-(N // 2), N // 2, N), 2) / (2 * sigma ** 2))
    weight /= weight.sum()
    ref = t
    for dim in range(3):
        ref = _torch_filter_1d(ref, weight, dim)
    ours = filters.smooth(jnp.asarray(img), sigma)
    np.testing.assert_allclose(np.asarray(ours), ref[0, 0].numpy(), atol=1e-5)


def test_gaussian_kernel_matches_scipy():
    from scipy.ndimage._filters import _gaussian_kernel1d
    for sigma, order in [(1.0, 0), (2.0, 1), (1.5, 2)]:
        radius = int(4.0 * sigma + 0.5)
        ref = _gaussian_kernel1d(sigma, order, radius)
        ours = filters.gaussian_kernel_1d(sigma, order)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_nms_matches_torch_maxpool(rng):
    img = rng.normal(size=(8, 9, 10)).astype(np.float32)
    for k in (3, 5):
        pad1, pad2 = k // 2, k - k // 2 - 1
        t = torch.from_numpy(img)[None, None]
        ref = F.max_pool3d(F.pad(t, (pad2, pad1) * 3, mode="replicate"), k, stride=1)
        ours = filters.max_pool_same(jnp.asarray(img), k)
        np.testing.assert_allclose(np.asarray(ours), ref[0, 0].numpy(), atol=1e-6)
