import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fissure_segmentation_tpu.keypoints.features import (compute_point_features,
                                                         descriptor_at_keypoints,
                                                         mind)
from fissure_segmentation_tpu.utils.sampling import (grid_sample_volume,
                                                     sample_patches_at_kpts)


def _torch_mind(img, dilation=1, sigma=0.8, ssc=True):
    """Reference MIND (data_processing/point_features.py:86-150)."""
    from tests.test_filters import _torch_filter_1d
    from torch import nn

    def smooth_t(x, s):
        N = int(torch.ceil(torch.tensor(s) * 3.0 / 2.0).item()) * 2 + 1
        w = torch.exp(-torch.pow(torch.linspace(-(N // 2), N // 2, N), 2) / (2 * s ** 2))
        w /= w.sum()
        for dim in range(3):
            x = _torch_filter_1d(x, w, dim)
        return x

    six_nh = torch.Tensor([[0, 1, 1], [1, 1, 0], [1, 0, 1],
                           [1, 1, 2], [2, 1, 1], [1, 2, 1]]).long()
    if ssc:
        v = six_nh.float()
        xx = (v ** 2).sum(1, keepdim=True)
        dist = xx - 2 * v @ v.t() + xx.t()
        dist[torch.arange(6), torch.arange(6)] = 0
        x, y = torch.meshgrid(torch.arange(6), torch.arange(6), indexing="ij")
        mask = ((x > y).reshape(-1) & (dist == 2).reshape(-1))
        idx_shift1 = six_nh.unsqueeze(1).repeat(1, 6, 1).view(-1, 3)[mask]
        idx_shift2 = six_nh.unsqueeze(0).repeat(6, 1, 1).view(-1, 3)[mask]
        mshift1 = torch.zeros(12, 1, 3, 3, 3)
        mshift1.view(-1)[torch.arange(12) * 27 + idx_shift1[:, 0] * 9
                         + idx_shift1[:, 1] * 3 + idx_shift1[:, 2]] = 1
        mshift2 = torch.zeros(12, 1, 3, 3, 3)
        mshift2.view(-1)[torch.arange(12) * 27 + idx_shift2[:, 0] * 9
                         + idx_shift2[:, 1] * 3 + idx_shift2[:, 2]] = 1
    else:
        mshift1 = torch.ones(6, 1, 3, 3, 3)
        mshift2 = torch.zeros(6, 3, 3, 3)
        mshift2[six_nh[:, 0], six_nh[:, 1], six_nh[:, 2]] = 1
        mshift2 = mshift2.unsqueeze(1)

    rpad = nn.ReplicationPad3d(dilation)
    m = smooth_t((F.conv3d(rpad(img), mshift1, dilation=dilation)
                  - F.conv3d(rpad(img), mshift2, dilation=dilation)) ** 2, sigma)
    m = m - torch.min(m, 1, keepdim=True)[0]
    var = torch.mean(m, 1, keepdim=True)
    var = torch.clamp(var, var.mean() * 0.001, var.mean() * 1000)
    m = torch.exp(-m / var)
    if ssc:
        m = m[:, torch.tensor([6, 8, 1, 11, 2, 10, 0, 7, 9, 4, 5, 3]).long()]
    return m


def test_mind_ssc_matches_reference(rng):
    img = rng.normal(size=(12, 14, 16)).astype(np.float32)
    ref = _torch_mind(torch.from_numpy(img)[None, None], ssc=True)
    ours = mind(jnp.asarray(img), ssc=True)
    np.testing.assert_allclose(np.asarray(ours), ref[0].numpy(),
                               rtol=1e-3, atol=1e-4)


def test_mind_plain_properties(rng):
    """The reference's plain-MIND branch is defective (point_features.py:
    129-133, see features.py note); check intended semantics instead."""
    img = rng.normal(size=(10, 10, 10)).astype(np.float32)
    m = np.asarray(mind(jnp.asarray(img), ssc=False))
    assert m.shape == (6, 10, 10, 10)
    assert np.isfinite(m).all()
    assert (m > 0).all() and (m <= 1 + 1e-6).all()
    # per-voxel max descriptor value is exp(0) = 1 (min subtracted)
    np.testing.assert_allclose(m.max(0), 1.0, atol=1e-5)


def test_grid_sample_matches_torch(rng):
    vol = rng.normal(size=(10, 12, 14)).astype(np.float32)
    coords = rng.uniform(-0.95, 0.95, (50, 3)).astype(np.float32)
    for mode in ("bilinear", "nearest"):
        ref = F.grid_sample(torch.from_numpy(vol)[None, None],
                            torch.from_numpy(coords)[None, :, None, None],
                            mode=mode, padding_mode="border", align_corners=False)
        ours = grid_sample_volume(jnp.asarray(vol), jnp.asarray(coords), mode=mode)
        np.testing.assert_allclose(np.asarray(ours), ref[0, 0, :, 0, 0].numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_sample_patches_identity_on_ramp(rng):
    """Reference test (utils/test_utils.py:8-57): sampling all points of a
    ramp volume with patch_size=1... we use the stronger variant: 5^3 patches
    at interior points equal direct slicing."""
    vol = rng.normal(size=(16, 16, 16)).astype(np.float32)
    # pick interior voxel centers
    vox = np.array([[5, 6, 7], [8, 8, 8], [10, 4, 12]])
    d, h, w = vol.shape
    size = np.array([w, h, d], np.float32)
    grid = (vox[:, ::-1] / (size - 1) * 2 - 1) * ((size - 1) / size)  # xyz
    patches = sample_patches_at_kpts(jnp.asarray(vol), jnp.asarray(grid.astype(np.float32)), 5)
    for i, (z, y, x) in enumerate(vox):
        direct = vol[z - 2:z + 3, y - 2:y + 3, x - 2:x + 3]
        np.testing.assert_allclose(np.asarray(patches[i]), direct, atol=1e-5)


def test_descriptor_lookup(rng):
    desc = jnp.asarray(rng.normal(size=(12, 8, 8, 8)).astype(np.float32))
    vox = np.array([[2, 3, 4]])
    size = np.array([8, 8, 8], np.float32)
    grid = (vox[:, ::-1] / (size - 1) * 2 - 1) * ((size - 1) / size)
    feats = descriptor_at_keypoints(desc, jnp.asarray(grid.astype(np.float32)))
    # the lookup truncates like the reference's `.long()`
    # (point_features.py:176-180); reproduce its fp32 roundtrip exactly
    from fissure_segmentation_tpu.utils.coords import kpts_to_world
    world = np.asarray(kpts_to_world(grid.astype(np.float32), (8, 8, 8)))
    x, y, z = world[0].astype(np.int64)
    np.testing.assert_allclose(np.asarray(feats[0]), np.asarray(desc[:, z, y, x]), atol=1e-5)
    # and the recovered voxel is within rounding of the true one
    assert abs(z - 2) <= 1 and abs(y - 3) <= 1 and abs(x - 4) <= 1


def test_compute_point_features_modes(rng):
    img = jnp.asarray(rng.normal(size=(16, 16, 16)).astype(np.float32))
    kpts = jnp.asarray(rng.uniform(-0.8, 0.8, (20, 3)).astype(np.float32))
    f_mind = compute_point_features(img, kpts, "mind_ssc")
    assert f_mind.shape == (20, 12)
    f_img = compute_point_features(img, kpts, "image")
    assert f_img.shape == (20, 125)
    f_enh = compute_point_features(img, kpts, "enhancement", enhanced_img=img)
    assert f_enh.shape == (20, 125)
