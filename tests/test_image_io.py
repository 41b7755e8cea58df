import numpy as np
import jax.numpy as jnp

from fissure_segmentation_tpu.utils.image_ops import (apply_mask,
                                                      multiple_objects_morphology,
                                                      resample_equal_spacing)
from fissure_segmentation_tpu.utils.nifti import (load_image_metadata,
                                                  load_nifti, save_nifti)


def test_nifti_roundtrip(tmp_path, rng):
    for suffix in (".nii", ".nii.gz"):
        arr = rng.normal(size=(10, 12, 14)).astype(np.float32)
        p = str(tmp_path / f"vol{suffix}")
        save_nifti(p, arr, spacing=(1.5, 1.5, 2.0))
        img = load_nifti(p)
        np.testing.assert_allclose(img.array, arr, atol=1e-6)
        assert img.spacing == (1.5, 1.5, 2.0)
        size, spacing = load_image_metadata(p)
        assert size == (10, 12, 14)
        assert spacing == (1.5, 1.5, 2.0)


def test_nifti_int_dtype(tmp_path):
    arr = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    p = str(tmp_path / "lbl.nii.gz")
    save_nifti(p, arr)
    img = load_nifti(p)
    np.testing.assert_array_equal(img.array, arr)
    assert img.array.dtype == np.int16


def test_resample_shapes():
    img = jnp.zeros((10, 20, 30))
    out = resample_equal_spacing(img, spacing=(1.0, 1.0, 2.0), target_spacing=1.0)
    assert out.shape == (20, 20, 30)  # z spacing 2 -> doubled depth
    out2 = resample_equal_spacing(img, spacing=(1.0, 1.0, 1.0), target_spacing=2.0,
                                  use_nearest_neighbor=True)
    assert out2.shape == (5, 10, 15)


def test_morphology_and_mask(rng):
    lbl = jnp.zeros((10, 10, 10), jnp.int32).at[5, 5, 5].set(2)
    dil = multiple_objects_morphology(lbl, radius=1, mode="dilate")
    assert int((np.asarray(dil) == 2).sum()) == 27
    ero = multiple_objects_morphology(dil, radius=1, mode="erode")
    assert int((np.asarray(ero) == 2).sum()) == 1

    img = jnp.asarray(rng.normal(size=(4, 4, 4)).astype(np.float32))
    mask = jnp.zeros((4, 4, 4), bool).at[0].set(True)
    out = np.asarray(apply_mask(img, mask))
    np.testing.assert_array_equal(out[0], np.asarray(img)[0])
    assert (out[1:] == 0).all()
