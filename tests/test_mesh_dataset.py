"""Tests for the mesh-backed dataset families (data/mesh_dataset.py) and the
similarity-transform inverse maps they rely on."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fissure_segmentation_tpu.data import (
    CorrespondingPointDataset, PointToMeshDS, SampleFromMeshDS,
    build_mesh_store, make_synthetic_dataset, make_synthetic_mesh_dataset)
from fissure_segmentation_tpu.data.augmentation import (
    SimilarityTransform, chain_transforms, compose_transform,
    decompose_similarity_transform, invert_transform, random_transform,
    so3_exp_map, so3_log_map, transform_points)
from fissure_segmentation_tpu.data.mesh_dataset import sample_mesh_batch
from fissure_segmentation_tpu.utils.objio import (load_obj, mesh_to_triangle_soup,
                                                  save_obj)


def test_so3_log_roundtrip():
    rng = np.random.default_rng(0)
    log_rot = jnp.asarray(rng.normal(0, 0.5, (8, 3)), jnp.float32)
    r = so3_exp_map(log_rot)
    rec = so3_log_map(r)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(log_rot), atol=1e-4)


def test_invert_and_chain_transforms():
    t = random_transform(jax.random.PRNGKey(0), (4,))
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 17, 3))
    fwd = transform_points(pts, t)
    back = transform_points(fwd, invert_transform(t))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)

    t2 = random_transform(jax.random.PRNGKey(2), (4,))
    both = transform_points(transform_points(pts, t), t2)
    chained = transform_points(pts, chain_transforms(t, t2))
    np.testing.assert_allclose(np.asarray(both), np.asarray(chained), atol=1e-4)


def test_decompose_roundtrip():
    t = random_transform(jax.random.PRNGKey(3), (2,))
    log_r, trans, scale = decompose_similarity_transform(t)
    rebuilt = compose_transform(log_r, trans, scale)
    pts = jax.random.normal(jax.random.PRNGKey(4), (2, 9, 3))
    np.testing.assert_allclose(np.asarray(transform_points(pts, rebuilt)),
                               np.asarray(transform_points(pts, t)), atol=1e-4)


def test_obj_roundtrip(tmp_path):
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    p = str(tmp_path / "m.obj")
    save_obj(p, verts, faces)
    v2, f2 = load_obj(p)
    np.testing.assert_allclose(v2, verts)
    np.testing.assert_array_equal(f2, faces)
    soup = mesh_to_triangle_soup(v2, f2)
    assert soup.shape == (2, 3, 3)


@pytest.fixture(scope="module")
def mesh_data():
    return make_synthetic_mesh_dataset(n_cases=3, grid_n=10, n_points=400,
                                       shape=(32, 32, 32), with_feature=False)


@pytest.mark.slow
def test_sample_from_mesh_ds(mesh_data):
    cases, meshes, sizes = mesh_data
    ids = [(c["case_id"], c["sequence"]) for c in cases]
    ds = SampleFromMeshDS(meshes, ids, sizes, sample_points=128)
    assert len(ds) == 3 * 3
    assert ds.continuous_to_pat_index(4) == 1 and ds.continuous_to_obj_index(4) == 1

    store = ds.to_store()
    soup = ds.get_obj_mesh(0)
    # normalized vertices live in [-1, 1]
    assert np.abs(soup).max() <= 1.0 + 1e-5

    x, target = ds.sample_batch(jax.random.PRNGKey(0), store,
                                jnp.asarray([0, 4]), n_target_samples=256)
    assert x.shape == (2, 128, 3)
    assert target.shape == (2, 256, 3)
    # augmented samples stay near the (augmented) target surface
    d = jnp.sqrt(((x[:, :, None] - target[:, None]) ** 2).sum(-1)).min(-1)
    assert float(d.mean()) < 0.05

    # exclude_rhf drops the third object
    ds2 = SampleFromMeshDS(meshes, ids, sizes, sample_points=64, exclude_rhf=True)
    assert ds2.num_objects == 2


def test_sample_from_mesh_split(mesh_data):
    cases, meshes, sizes = mesh_data
    ids = [(c["case_id"], c["sequence"]) for c in cases]
    ds = SampleFromMeshDS(meshes, ids, sizes, sample_points=64)
    split = {"train": [list(ids[0]), list(ids[1])], "val": [list(ids[2])]}
    tr, vl = ds.split_data_set(split)
    assert len(tr.ids) == 2 and len(vl.ids) == 1
    assert not vl.do_augmentation


def test_point_to_mesh_ds(mesh_data):
    cases, meshes, sizes = mesh_data
    ds = PointToMeshDS([dict(c) for c in cases], meshes, sizes,
                       sample_points=128, do_augmentation=False)
    store = ds.mesh_store()
    assert store.n_items == 3
    cls_store = ds.class_mesh_store(label=1)
    assert cls_store.n_items == 3
    # merged store has the union of the class stores' triangles
    assert int(store.valid[0].sum()) == sum(
        int(ds.class_mesh_store(l).valid[0].sum()) for l in (1, 2, 3))
    # sampled surface points match the case's labeled keypoints region
    samples, _ = sample_mesh_batch(jax.random.PRNGKey(0), cls_store,
                                   jnp.asarray([0]), 128, augment=False)
    kp = cases[0]["coords"][cases[0]["labels"] == 1]
    d = np.sqrt(((np.asarray(samples[0])[:, None] - kp[None]) ** 2).sum(-1)).min(-1)
    assert d.mean() < 0.1


def test_corresponding_point_dataset():
    cases = make_synthetic_dataset(3, n_points=300, shape=(32, 32, 32),
                                   with_feature=False)
    rng = np.random.default_rng(1)
    p = 50
    corr = rng.uniform(5, 25, (3, p, 3)).astype(np.float32)
    prereg = []
    for i in range(3):
        log_r = rng.normal(0, 0.1, 3).astype(np.float32)
        prereg.append({
            "rotation": np.asarray(so3_exp_map(jnp.asarray(log_r))),
            "translation": rng.normal(0, 2, 3).astype(np.float32),
            "scale": float(rng.uniform(0.9, 1.1)),
        })
    ds = CorrespondingPointDataset(cases, corr, prereg, sample_points=64,
                                   do_augmentation=False)
    pts, params = ds.target_for_case(0)
    assert pts.shape == (p, 3) and params.shape == (9,)
    assert np.abs(pts).max() <= 1.0 + 1e-5

    # identity pre-registration => identity target transform
    ident = [{"rotation": np.eye(3, dtype=np.float32),
              "translation": np.zeros(3, np.float32), "scale": 1.0}] * 3
    ds_id = CorrespondingPointDataset(cases, corr, ident, sample_points=64,
                                      do_augmentation=False)
    _, params_id = ds_id.target_for_case(0)
    np.testing.assert_allclose(params_id[:6], 0, atol=1e-5)
    np.testing.assert_allclose(params_id[6:9], 1, atol=1e-5)

    # device batch path
    corr_pts, corr_params = ds.corr_targets()
    store = ds.to_store()
    x, (t_corr, t_params) = ds.sample_batch(
        jax.random.PRNGKey(0), store, jnp.asarray([0, 1]),
        jnp.asarray(corr_pts), jnp.asarray(corr_params))
    assert x.shape[0] == 2 and x.shape[1] == 64
    assert t_corr.shape == (2, p, 3) and t_params.shape == (2, 9)

    # with augmentation the target params change but stay finite
    ds.augment_correspondingly = True
    x2, (_, t_params2) = ds.sample_batch(
        jax.random.PRNGKey(5), store, jnp.asarray([0, 1]),
        jnp.asarray(corr_pts), jnp.asarray(corr_params))
    assert np.isfinite(np.asarray(t_params2)).all()
    assert not np.allclose(np.asarray(t_params2), np.asarray(t_params))


def test_corresponding_split():
    cases = make_synthetic_dataset(4, n_points=200, shape=(32, 32, 32),
                                   with_feature=False)
    corr = np.random.default_rng(0).uniform(5, 25, (4, 20, 3)).astype(np.float32)
    ident = [{"rotation": np.eye(3, dtype=np.float32),
              "translation": np.zeros(3, np.float32), "scale": 1.0}] * 4
    ds = CorrespondingPointDataset(cases, corr, ident, sample_points=32)
    ids = ds.ids
    split = {"train": [list(ids[0]), list(ids[1]), list(ids[2])],
             "val": [list(ids[3])]}
    tr, vl = ds.split_data_set(split)
    assert len(tr) == 3 and len(vl) == 1
    assert not vl.augment_correspondingly
