import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.data import (PointCloudStore, PointDataset,
                                           create_split, load_split_file,
                                           make_synthetic_case,
                                           make_synthetic_dataset,
                                           point_augmentation, sample_batch,
                                           save_split_file)
from fissure_segmentation_tpu.data.dataset import (compute_class_weights,
                                                   load_case_npz, save_case_npz)


def test_synthetic_case_properties():
    case = make_synthetic_case(0, n_points=2000)
    assert case["coords"].shape == (2000, 3)
    assert np.abs(case["coords"]).max() <= 1.0
    labels = case["labels"]
    assert set(np.unique(labels)) <= {0, 1, 2, 3}
    # all three fissures present with decent support
    for l in (1, 2, 3):
        assert (labels == l).sum() > 100
    assert case["features"].shape == (2000, 1)
    # feature should correlate with fissure membership
    f_fis = case["features"][labels != 0].mean()
    f_bg = case["features"][labels == 0].mean()
    assert f_fis > f_bg + 0.2


def test_case_npz_roundtrip(tmp_path):
    case = make_synthetic_case(1, n_points=500)
    path = save_case_npz(case, str(tmp_path))
    loaded = load_case_npz(path)
    np.testing.assert_array_equal(loaded["coords"], case["coords"])
    np.testing.assert_array_equal(loaded["labels"], case["labels"])
    assert loaded["case_id"] == case["case_id"]
    assert loaded["surface_params"].keys() == case["surface_params"].keys()


@pytest.mark.slow
def test_point_dataset_and_store():
    cases = make_synthetic_dataset(6, n_points=1000)
    ds = PointDataset(cases, sample_points=256)
    assert ds.num_classes == 4
    assert ds.n_features == 4  # coords + 1 feature
    w = ds.get_class_weights()
    assert w.shape == (4,)
    assert w[0] < w[1]  # background more frequent -> lower weight

    store = ds.to_store()
    assert store.coords.shape[1] % 128 == 0
    x, y = sample_batch(jax.random.PRNGKey(0), store, jnp.array([0, 1, 2]), 256)
    assert x.shape == (3, 256, 4)
    assert y.shape == (3, 256)

    # binary mode
    ds_bin = PointDataset([dict(c) for c in cases], sample_points=256, binary=True)
    _, yb = sample_batch(jax.random.PRNGKey(0), ds_bin.to_store(), jnp.array([0]),
                         256, binary=True)
    assert set(np.unique(np.asarray(yb))) <= {0, 1}


def test_sampling_only_valid_points():
    cases = [dict(coords=np.random.randn(300, 3).astype(np.float32) * 0.1,
                  labels=np.full(300, 2, np.int32), case_id="a", sequence="s"),
             dict(coords=np.random.randn(700, 3).astype(np.float32) * 0.1,
                  labels=np.full(700, 1, np.int32), case_id="b", sequence="s")]
    ds = PointDataset(cases, sample_points=256)
    store = ds.to_store()
    x, y = sample_batch(jax.random.PRNGKey(3), store, jnp.array([0, 1]), 256,
                        augment=False)
    # case 0 has only 300 valid points out of padded N; all sampled labels
    # must be the real label (padding label is 0)
    assert np.all(np.asarray(y[0]) == 2)
    assert np.all(np.asarray(y[1]) == 1)


def test_augmentation_is_similarity():
    pts = jnp.asarray(np.random.default_rng(0).normal(0, 0.3, (2, 100, 3)).astype(np.float32))
    out, t = point_augmentation(jax.random.PRNGKey(0), pts)
    assert out.shape == pts.shape
    # similarity transform preserves pairwise distance ratios (scale s)
    d_in = np.linalg.norm(np.asarray(pts[0, 1:] - pts[0, :-1]), axis=-1)
    d_out = np.linalg.norm(np.asarray(out[0, 1:] - out[0, :-1]), axis=-1)
    ratios = d_out / d_in
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-2)  # f32 rotation
    assert 0.89 <= ratios.mean() <= 1.005  # scale in [0.9, 1.0]


def test_split_roundtrip(tmp_path):
    ids = [(f"case{i}", "fixed") for i in range(10)]
    split = create_split(ids, k=5)
    assert len(split) == 5
    for s in split:
        assert len(s["val"]) == 2
        assert len(s["train"]) == 8
        assert not set(map(tuple, s["train"])) & set(map(tuple, s["val"]))
    # each case appears in val exactly once
    all_val = [tuple(v) for s in split for v in s["val"]]
    assert sorted(all_val) == sorted(map(tuple, ids))

    p = str(tmp_path / "split.json")
    save_split_file(split, p)
    loaded = load_split_file(p)
    assert [tuple(map(tuple, s["val"])) for s in loaded] == \
           [tuple(map(tuple, s["val"])) for s in split]

    ds = PointDataset(make_synthetic_dataset(10, n_points=500), sample_points=128)
    split2 = create_split(ds.ids, k=5)
    tr, vl = ds.split_data_set(split2[0])
    assert len(tr) == 8 and len(vl) == 2


def test_class_weights_formula():
    w = compute_class_weights(np.array([70.0, 10, 10, 10]))
    np.testing.assert_allclose(w, (1 - np.array([0.7, 0.1, 0.1, 0.1])) * 4)
