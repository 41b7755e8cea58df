"""Tests for the L2 preprocessing layer (preprocess/labels.py, pipeline.py):
lobes<->fissures conversions, lung masks, crop ranges, GT mesh creation."""
import numpy as np
import jax.numpy as jnp
import pytest

from fissure_segmentation_tpu.data import make_synthetic_image_case
from fissure_segmentation_tpu.preprocess import (
    binary_morphology, find_fissures, find_lobes, find_non_zero_range,
    generate_lung_mask, label_to_mesh, preprocess_totalsegmentator_case,
    save_meshes)
from fissure_segmentation_tpu.data.mesh_dataset import load_meshes


@pytest.fixture(scope="module")
def case():
    return make_synthetic_image_case(0, shape=(48, 48, 48))


def test_binary_morphology():
    m = jnp.zeros((16, 16, 16), bool).at[8, 8, 8].set(True)
    d = binary_morphology(m, 1, "dilate")
    assert int(d.sum()) == 27
    e = binary_morphology(d, 1, "erode")
    assert int(e.sum()) == 1
    assert bool(e[8, 8, 8])
    # opening removes specks smaller than the kernel
    o = binary_morphology(m, 1, "open")
    assert int(o.sum()) == 0
    # closing fills small holes
    ring = jnp.ones((16, 16, 16), bool).at[8, 8, 8].set(False)
    c = binary_morphology(ring, 1, "close")
    assert bool(c[8, 8, 8])


def test_find_fissures_from_lobes(case):
    lobes = jnp.asarray(case["lobes"])
    fissures = np.asarray(find_fissures(lobes))
    assert set(np.unique(fissures)) <= {0, 1, 2, 3}
    # every fissure label present and near the rasterized GT fissures
    gt = case["labels"]
    for lbl in (1, 2, 3):
        pred = np.argwhere(fissures == lbl)
        assert len(pred) > 0
        gt_pts = np.argwhere(gt == lbl)
        d = np.abs(pred[:, None, 0] - gt_pts[None, :, 0]).min() \
            if len(gt_pts) else 99
        # same z-neighborhood (cheap sanity: median z within 3 voxels)
        assert abs(np.median(pred[:, 0]) - np.median(gt_pts[:, 0])) < 4


def test_generate_lung_mask(case):
    mask = np.asarray(generate_lung_mask(jnp.asarray(case["lobes"])))
    np.testing.assert_array_equal(mask, case["lobes"] > 0)


def test_find_non_zero_range():
    m = np.zeros((32, 16, 16), np.int32)
    m[10:20, 2:14, 2:14] = 1  # block thick enough to survive the opening
    lo, hi = find_non_zero_range(m, axis=0)
    assert 8 <= lo <= 12 and 18 <= hi <= 22
    # speck outside is ignored by the opening
    m2 = m.copy()
    m2[2, 8, 8] = 1
    lo2, hi2 = find_non_zero_range(m2, axis=0)
    assert lo2 >= 8


def test_preprocess_totalsegmentator_case(case):
    img = case["image"] * 2500 - 1000  # fake HU range
    out = preprocess_totalsegmentator_case(img, case["lobes"], z_pad=2)
    assert out["image"].shape == out["lobes"].shape == out["fissures"].shape
    assert out["image"].min() >= -1001 and out["image"].max() <= 1500
    assert out["lung_mask"].dtype == bool
    assert set(np.unique(out["fissures"])) <= {0, 1, 2, 3}
    # cropped to the lobe z-range (lungs span ~10%..90% of z)
    assert out["image"].shape[0] <= case["image"].shape[0]


def test_preprocess_totalsegmentator_case_v1(case):
    """legacy_v1 (preprocess_totalsegmentator_dataset_v1.py): z_pad 20, raw
    z-range (no opening), and NO HU clamp — vs the v2 defaults."""
    img = case["image"] * 2500 - 1000
    # one bone-bright voxel inside the lobe crop: exceeds the v2 clamp
    zc = np.argwhere(case["lobes"] > 0)[0]
    img[zc[0], zc[1], zc[2]] = 2000.0
    v1 = preprocess_totalsegmentator_case(img, case["lobes"], legacy_v1=True)
    v2 = preprocess_totalsegmentator_case(img, case["lobes"])
    assert v1["image"].max() > 1500 >= v2["image"].max()  # clamp only in v2
    # v1 pads the lobe z-range by 20 (clipped at the volume border), so its
    # crop can only be taller than v2's z_pad=15 crop
    assert v1["image"].shape[0] >= v2["image"].shape[0]
    # label derivation identical between versions on the common crop
    assert set(np.unique(v1["fissures"])) == set(np.unique(v2["fissures"]))


def test_find_lobes_roundtrip(case):
    """fissures + lung mask -> lobes recovers the 5-lobe partition."""
    lobes_gt = case["lobes"]
    fissures = np.asarray(find_fissures(jnp.asarray(lobes_gt)))
    # toy 48^3 lungs need smaller morphology radii than full-size CT
    lobes, success = find_lobes(jnp.asarray(fissures), jnp.asarray(case["lung_mask"]),
                                exclude_rhf=False, fill=True, cg_iters=200,
                                erode_radius=1, close_radius=1,
                                dilate_radius=1, open_radius=1)
    assert success
    assert set(np.unique(lobes)) <= {0, 1, 2, 3, 4, 5}
    # agreement with GT lobes inside the (eroded) lung
    inner = np.asarray(binary_morphology(jnp.asarray(case["lung_mask"]), 2, "erode"))
    agree = (lobes == lobes_gt)[inner & (lobes_gt > 0)].mean()
    assert agree > 0.75, f"lobe agreement {agree:.2f}"


def test_label_to_mesh_and_save(case, tmp_path):
    tris, valid = label_to_mesh(case["lobes"], 4)
    assert int(np.asarray(valid).sum()) > 50
    paths = save_meshes([(np.asarray(tris), np.asarray(valid))], str(tmp_path),
                        "caseA", "fixed", obj_name="lobe")
    assert len(paths) == 1
    soups = load_meshes(str(tmp_path), "caseA", "fixed", obj_name="lobe")
    assert len(soups) == 1 and soups[0].shape[1:] == (3, 3)
