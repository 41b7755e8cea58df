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
