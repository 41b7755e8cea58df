"""Tests for data/image_dataset.py (LungDataIndex, ImageDataset, device
augmentation) against synthetic rasterized cases."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.data import (ImageDataset, LungDataIndex,
                                           augment_image_batch,
                                           make_synthetic_image_case,
                                           random_patch_crop)
from fissure_segmentation_tpu.utils.nifti import save_nifti


@pytest.fixture(scope="module")
def img_cases():
    return [make_synthetic_image_case(i, shape=(48, 48, 48)) for i in range(3)]


def test_synthetic_image_case(img_cases):
    c = img_cases[0]
    assert c["image"].shape == (48, 48, 48)
    assert set(np.unique(c["labels"])) <= {0, 1, 2, 3}
    assert set(np.unique(c["lobes"])) <= {0, 1, 2, 3, 4, 5}
    # fissures lie inside the lung mask
    assert (c["lung_mask"][c["labels"] > 0]).all()
    # lobes fill the lungs
    assert ((c["lobes"] > 0) == c["lung_mask"]).mean() > 0.99


def test_lung_data_index(tmp_path, img_cases):
    folder = str(tmp_path)
    for c in img_cases[:2]:
        cid, seq = c["case_id"], c["sequence"]
        save_nifti(os.path.join(folder, f"{cid}_img_{seq}.nii.gz"), c["image"])
        save_nifti(os.path.join(folder, f"{cid}_fissures_{seq}.nii.gz"), c["labels"])
        save_nifti(os.path.join(folder, f"{cid}_mask_{seq}.nii.gz"),
                   c["lung_mask"].astype(np.uint8))
    # one case without fissures
    c = img_cases[2]
    save_nifti(os.path.join(folder, f"{c['case_id']}_img_{c['sequence']}.nii.gz"),
               c["image"])

    index = LungDataIndex(folder)
    assert len(index) == 3
    assert index.fissures[0] is not None and index.fissures[2] is None
    assert index.lung_masks[0] is not None and index.lobes[0] is None
    img = index.get_image(0)
    assert img.array.shape == (48, 48, 48)
    fis = index.get_fissures(0)
    assert set(np.unique(fis.array)) <= {0, 1, 2, 3}

    ds = ImageDataset.from_folder(folder, resample_spacing=1.0,
                                  patch_size=(32, 32, 32))
    assert len(ds) == 2  # the fissure-less case is dropped (data.py:284)


def test_random_patch_crop(img_cases):
    rng = np.random.default_rng(0)
    c = img_cases[0]
    img, lbl = random_patch_crop(rng, c["image"], c["labels"], (32, 32, 32))
    assert img.shape == (32, 32, 32) and lbl.shape == (32, 32, 32)
    # padding path: patch larger than the volume
    img2, lbl2 = random_patch_crop(rng, c["image"], c["labels"], (64, 64, 64))
    assert img2.shape == (64, 64, 64)
    assert (lbl2[:8] == 0).all()  # padded region is background


def test_augment_image_batch():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 16)).astype(np.float32))
    lbls = jnp.asarray((rng.uniform(0, 1, (2, 16, 16, 16)) > 0.8).astype(np.int32))
    out_i, out_l = jax.jit(augment_image_batch)(jax.random.PRNGKey(0), imgs, lbls)
    assert out_i.shape == imgs.shape and out_l.shape == lbls.shape
    assert out_l.dtype == lbls.dtype
    assert set(np.unique(np.asarray(out_l))) <= {0, 1}
    assert not np.allclose(np.asarray(out_i), np.asarray(imgs))


def test_elastic_displacement_field_statistics():
    """The coarse-grid field matches batchgenerators' full-res-noise+Gaussian
    field in magnitude (std) and correlation length (augmentations.py:36-38,
    alpha=1000, sigma~12)."""
    from fissure_segmentation_tpu.data.image_dataset import (
        _ELASTIC_SIGMA, elastic_displacement_field)
    alpha = 1000.0
    field = np.asarray(elastic_displacement_field(
        jax.random.PRNGKey(3), (48, 48, 48), alpha))
    assert field.shape == (48, 48, 48, 3)
    target_std = alpha * np.sqrt(1 / 3) * (2 * _ELASTIC_SIGMA * np.sqrt(np.pi)) ** -1.5
    assert abs(field.std() / target_std - 1.0) < 0.35  # ~2.1 voxels at alpha=1000
    # smooth over ~sigma: adjacent voxels nearly identical, far voxels decorrelated
    adj = np.corrcoef(field[:-1].ravel(), field[1:].ravel())[0, 1]
    far = np.corrcoef(field[:, :, :16].ravel(), field[:, :, 32:].ravel())[0, 1]
    assert adj > 0.95 and abs(far) < 0.3
    # alpha=0 disables the deformation entirely
    zero = np.asarray(elastic_displacement_field(jax.random.PRNGKey(3), (16,) * 3, 0.0))
    assert np.abs(zero).max() == 0.0


def test_augment_elastic_label_consistency():
    """Elastic warp keeps image (order-1) and label (order-0) aligned, and the
    per-sample gate leaves ungated samples untouched."""
    z = np.linspace(-1, 1, 24, dtype=np.float32)
    blob = np.exp(-(z[:, None, None] ** 2 + z[None, :, None] ** 2
                    + z[None, None, :] ** 2) / 0.18)
    imgs = jnp.asarray(np.stack([blob, blob]))
    lbls = jnp.asarray((imgs > 0.5).astype(np.int32))
    out_i, out_l = jax.jit(lambda r, x, y: augment_image_batch(
        r, x, y, p_rotscale=1.0, noise_std=0.0,
        elastic_alpha=(900.0, 1000.0)))(jax.random.PRNGKey(5), imgs, lbls)
    # the warp moved the boundary...
    assert (np.asarray(out_l) != np.asarray(lbls)).any()
    # ...but image and label moved together
    agree = ((np.asarray(out_i) > 0.5) == (np.asarray(out_l) > 0)).mean()
    assert agree > 0.97
    # gate off (p_rotscale=0) + no noise + elastic on -> spatial identity up to mirroring
    same_i, same_l = jax.jit(lambda r, x, y: augment_image_batch(
        r, x, y, mirror_axes=(), p_rotscale=0.0, noise_std=0.0))(
            jax.random.PRNGKey(5), imgs, lbls)
    np.testing.assert_allclose(np.asarray(same_i), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(same_l), np.asarray(lbls))


def test_image_dataset_batches_and_split(img_cases):
    ds = ImageDataset([c["image"] for c in img_cases],
                      [c["labels"] for c in img_cases],
                      [(c["case_id"], c["sequence"]) for c in img_cases],
                      resample_spacing=1.0, patch_size=(32, 32, 32))
    assert ds.num_classes == 4
    w = ds.get_class_weights()
    assert w.shape == (4,) and w[0] < w[1]  # background is most frequent

    imgs, lbls = ds.sample_batch(np.random.default_rng(0),
                                 jax.random.PRNGKey(0), [0, 1])
    assert imgs.shape == (2, 32, 32, 32)
    assert lbls.shape == (2, 32, 32, 32)
    assert float(jnp.abs(imgs).max()) < 5.0

    ids = ds.ids
    tr, vl = ds.split_data_set({"train": [list(ids[0]), list(ids[1])],
                                "val": [list(ids[2])]})
    assert len(tr) == 2 and len(vl) == 1 and not vl.do_augmentation


def test_exclude_rhf_and_binary(img_cases):
    base = dict(images=[img_cases[0]["image"]], labels=[img_cases[0]["labels"]],
                ids=[("a", "b")], resample_spacing=1.0, patch_size=(16, 16, 16))
    ds = ImageDataset(**base, exclude_rhf=True)
    assert 3 not in np.unique(ds.labels[0])
    ds_bin = ImageDataset(**base, binary=True)
    assert set(np.unique(ds_bin.labels[0])) <= {0, 1}
    assert ds_bin.num_classes == 2
