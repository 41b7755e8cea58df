"""serving.segment_case: packing/host-half exactness + staged-path parity.

Two comparison tiers, because XLA compiles the fused and staged pipelines
into different programs whose FMA fusion differs in ulps — and the PSR
normal estimation breaks integer-grid kNN distance ties differently under
those ulps, so meshes are NOT bit-reproducible across compilation contexts:

  1. EXACT: segment_case's host half (unpacking, quantization decode,
     per-class filtering, labelmap) against a manual decode of the SAME
     fused _device_case outputs (same compiled executable, cached).
  2. FUNCTIONAL: the fused device half against the staged pipeline
     (foerstner -> ensemble -> fit): keypoints/labels exact (argmax is
     ulp-robust), meshes via bulk chamfer + triangle counts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.keypoints.foerstner import foerstner_keypoints
from fissure_segmentation_tpu.models import DGCNNSeg, ensemble_predict
from fissure_segmentation_tpu.postprocess.surface_fitting import (
    _decode_packed_mesh, _host_mesh_filter, mesh_to_labelmap)
from fissure_segmentation_tpu.serving import _device_case, segment_case
from fissure_segmentation_tpu.utils.coords import kpts_to_grid

SHAPE = (48, 48, 48)
# max_tris must NOT saturate: when triangles overflow the budget, WHICH ones
# survive depends on slab order, amplifying cross-compilation ulp noise
CFG = dict(max_kpts=2000, sample_points=128, n_runs_min=4, subset_batch=2,
           grid_res=(24, 24, 24), max_tris=24000)


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    img = rng.normal(-700, 80, SHAPE).astype(np.float32)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in SHAPE], indexing="ij")
    sheet = np.abs(zz - (20 + 0.2 * yy)) < 1.0
    img[sheet] = -300.0
    mask = np.ones(SHAPE, bool)
    model = DGCNNSeg(k=8, in_features=3, num_classes=4, dynamic=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 3), jnp.float32), train=False)
    return img, mask, model, variables


def _run(case, rng):
    img, mask, model, variables = case
    return segment_case(img, mask, model.apply, variables, rng,
                        center_x=SHAPE[2] / 2, **CFG)


def test_host_half_is_exact_decode_of_device_outputs(case):
    """Tier 1: same compiled device executable -> bitwise-equal result."""
    img, mask, model, variables = case
    rng = jax.random.PRNGKey(7)
    res = _run(case, rng)

    out = _device_case(
        jnp.asarray(img), jnp.asarray(mask), variables, rng,
        apply_fn=model.apply, kp_mode="foerstner", sig=4.0, k_normals=30,
        num_fg_classes=3, fissure_mu=-313.5, fissure_sigma=62.6, **CFG)
    (kpts_q, valid_bits, pred, inside_bits, idx, vkey, vfrac_q, n_tris,
     n_verts) = jax.device_get(out)

    valid = np.unpackbits(valid_bits, count=CFG["max_kpts"]).astype(bool)
    kpts = kpts_q.astype(np.int32)
    np.testing.assert_array_equal(res.kpts, kpts[valid])
    np.testing.assert_array_equal(res.labels, pred[valid].astype(np.int32))

    inside = np.unpackbits(inside_bits, axis=-1,
                           count=int(np.prod(CFG["grid_res"])))
    inside = inside.reshape(3, *CFG["grid_res"]).astype(bool)
    world = kpts[:, ::-1].astype(np.float32)
    meshes = []
    for i in range(3):
        pts_c = world[valid & (pred == i + 1)]
        n = int(n_tris[i])
        if len(pts_c) < 4 or n == 0:
            meshes.append((np.zeros((0, 3, 3), np.float32),
                           np.zeros(0, bool)))
            continue
        tris_i = _decode_packed_mesh(idx[i], vkey[i], vfrac_q[i], n,
                                     int(n_verts[i]), CFG["grid_res"])
        meshes.append(_host_mesh_filter(
            inside[i], tris_i,
            np.ones(n, bool), pts_c, SHAPE, CFG["grid_res"], None, 1,
            [False, True, True][i], SHAPE[2] / 2, True))
    assert sum(int(v.sum()) for _, v in meshes) > 0
    for (t1, v1), (t2, v2) in zip(res.meshes, meshes):
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(res.labelmap, mesh_to_labelmap(meshes, SHAPE))


@pytest.mark.slow
def test_fused_matches_staged_pipeline_functionally(case):
    """Tier 2: staged pipeline parity — exact where ulp-robust, bulk-chamfer
    where compilation-context ulps flip kNN ties / phi signs."""
    img, mask, model, variables = case
    rng = jax.random.PRNGKey(7)
    res = _run(case, rng)

    kpts, valid, _ = foerstner_keypoints(jnp.asarray(img), jnp.asarray(mask),
                                         sigma=0.5, d=5, thresh=1e-8,
                                         max_kpts=CFG["max_kpts"])
    world = kpts[:, ::-1].astype(jnp.float32)
    coords = jnp.where(valid[:, None], kpts_to_grid(world, SHAPE), -1.0)
    probs = ensemble_predict(model.apply, variables, coords, rng,
                             sample_points=CFG["sample_points"],
                             n_runs_min=CFG["n_runs_min"],
                             subset_batch=CFG["subset_batch"])
    pred = np.asarray(jnp.argmax(probs, -1))
    kpts, valid = np.asarray(kpts), np.asarray(valid)
    np.testing.assert_array_equal(res.kpts, kpts[valid])
    np.testing.assert_array_equal(res.labels, pred[valid])

    from fissure_segmentation_tpu.postprocess.surface_fitting import \
        fit_fissure_surfaces
    world_np = np.asarray(jnp.where(valid[:, None], world, -1.0), np.float32)
    class_valid = np.stack([valid & (pred == c) for c in (1, 2, 3)])
    meshes = fit_fissure_surfaces(world_np, class_valid, SHAPE,
                                  grid_res=CFG["grid_res"],
                                  max_tris=CFG["max_tris"],
                                  rights=[False, True, True],
                                  center_x=SHAPE[2] / 2)
    for (t1, v1), (t2, v2) in zip(res.meshes, meshes):
        n1, n2 = int(v1.sum()), int(v2.sum())
        assert abs(n1 - n2) <= max(8, 0.05 * max(n1, n2))
        if min(n1, n2) == 0:
            continue
        c1, c2 = t1[v1].mean(1), t2[v2].mean(1)
        d = np.linalg.norm(c1[:, None] - c2[None], axis=-1)
        # the bulk of both surfaces must coincide to sub-voxel precision
        assert max(np.median(d.min(1)), np.median(d.min(0))) < 0.3


@pytest.mark.slow  # ~12 s: compiles its own fused device graph; the
# enhancement detector itself is unit-tested in test_keypoints/test_extraction
def test_enhancement_mode_runs(case):
    img, mask, model, variables = case
    res = segment_case(img, mask, model.apply, variables,
                       jax.random.PRNGKey(3), kp_mode="enhancement",
                       make_labelmap=False, **CFG)
    assert res.kpts.shape[1] == 3 and res.labelmap is None
    assert len(res.meshes) == 3


def test_cnn_mode_runs(case):
    img, mask, model, variables = case
    rng = np.random.default_rng(1)
    soft = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(*SHAPE, 4)).astype(np.float32)), -1)
    res = segment_case(soft, mask, model.apply, variables,
                       jax.random.PRNGKey(4), kp_mode="cnn", **CFG)
    assert len(res.kpts) > 0
    assert res.labelmap.shape == SHAPE


@pytest.mark.slow
def test_cnn_fused_forward_matches_staged(case):
    """segment_case(cnn_apply_fn=...) runs the pre-seg CNN INSIDE the fused
    dispatch; its keypoint/label outputs must closely match the staged
    protocol (predict_full_volume -> segment_case on the softmax volume).
    Exact equality is not guaranteed: the two compilation contexts fuse the
    CNN forward differently, and an ulp flip at a near-tie argmax voxel can
    swap a keypoint slot — so assert high overlap instead."""
    from fissure_segmentation_tpu.models.seg_cnn import (MobileNetASPP,
                                                         predict_full_volume)
    img, mask, model, variables = case
    cnn = MobileNetASPP(num_classes=4)
    cnn_vars = cnn.init(jax.random.PRNGKey(9),
                        jnp.zeros((1, 16, 16, 16, 1), jnp.float32),
                        train=False)
    rng = jax.random.PRNGKey(4)
    soft = predict_full_volume(cnn.apply, cnn_vars, jnp.asarray(img))
    staged = segment_case(soft, mask, model.apply, variables, rng,
                          kp_mode="cnn", make_labelmap=False, **CFG)
    fused = segment_case(jnp.asarray(img), mask, model.apply, variables, rng,
                         kp_mode="cnn", cnn_apply_fn=cnn.apply,
                         cnn_variables=cnn_vars, make_labelmap=False, **CFG)
    assert len(fused.kpts) > 0 and len(fused.meshes) == 3
    sk = {tuple(k) for k in staged.kpts}
    fk = {tuple(k) for k in fused.kpts}
    overlap = len(sk & fk) / max(1, len(sk))
    assert overlap > 0.99, overlap


@pytest.mark.slow  # ~12 s: compiles its own fused device graph; approx
# top-k selection is unit-tested in test_topk/test_keypoints
def test_approx_top_k_mode_runs(case):
    """Fast serving variant: approx detector top-k (lax.approx_max_k) must
    produce a structurally equivalent result — same shapes, high keypoint
    overlap with the exact path.

    NOTE: on the CPU test backend `lax.approx_max_k` lowers to *exact*
    top-k, so this covers the wiring/shape contract only and the recall
    assertion is near-tautological here; the real approximation is
    exercised on-device by bench.py (recall 0.97 measured on TPU, PERF.md
    kNN row) and the fast-vs-exact accuracy artifact in README."""
    img, mask, model, variables = case
    rng = jax.random.PRNGKey(7)
    exact = _run(case, rng)
    approx = segment_case(img, mask, model.apply, variables, rng,
                          center_x=SHAPE[2] / 2, approx_top_k=True, **CFG)
    assert approx.kpts.shape[1] == 3 and len(approx.meshes) == 3
    ek = {tuple(k) for k in exact.kpts}
    ak = {tuple(k) for k in approx.kpts}
    recall = len(ek & ak) / max(1, len(ek))
    assert recall > 0.9, recall


def test_segment_cases_pipelined_matches_sequential(case):
    """serving.segment_cases keeps a window of device dispatches in flight;
    results must be IDENTICAL to per-case segment_case calls with the same
    per-case fold_in rngs (same executable, same inputs — the pipelining
    only reorders host-side fetches)."""
    from fissure_segmentation_tpu.serving import segment_cases

    img, mask, model, variables = case
    rng = jax.random.PRNGKey(11)
    vols = [img, img * 1.0001, img]
    masks = [mask] * 3

    batch = segment_cases(vols, masks, model.apply, variables, rng,
                          window=2, center_x=SHAPE[2] / 2, **CFG)
    assert len(batch) == 3
    for i, r in enumerate(batch):
        ref = segment_case(vols[i], masks[i], model.apply, variables,
                           jax.random.fold_in(rng, i),
                           center_x=SHAPE[2] / 2, **CFG)
        np.testing.assert_array_equal(r.kpts, ref.kpts)
        np.testing.assert_array_equal(r.labels, ref.labels)
        np.testing.assert_array_equal(r.labelmap, ref.labelmap)
        for (t1, v1), (t2, v2) in zip(r.meshes, ref.meshes):
            np.testing.assert_array_equal(v1, v2)
            np.testing.assert_allclose(t1, t2, rtol=0, atol=0)


def test_segment_cases_threaded_and_fallback_agree(case):
    """The threaded 3-stage pipeline (default) and the single-threaded
    window fallback must produce identical results — threading only
    reorders waits, never computations."""
    from fissure_segmentation_tpu.serving import segment_cases

    img, mask, model, variables = case
    rng = jax.random.PRNGKey(13)
    vols = [img, img * 0.999]
    tm: list = []
    a = segment_cases(vols, [mask] * 2, model.apply, variables, rng,
                      timings=tm, center_x=SHAPE[2] / 2, **CFG)
    b = segment_cases(vols, [mask] * 2, model.apply, variables, rng,
                      pipeline_threads=False, window=2,
                      center_x=SHAPE[2] / 2, **CFG)
    assert {"dispatch_s", "fetch_s", "host_s"} <= set(tm[0])
    for ra, rb in zip(a, b):
        np.testing.assert_array_equal(ra.kpts, rb.kpts)
        np.testing.assert_array_equal(ra.labelmap, rb.labelmap)
        for (t1, v1), (t2, v2) in zip(ra.meshes, rb.meshes):
            np.testing.assert_array_equal(v1, v2)
            np.testing.assert_array_equal(t1, t2)


def test_segment_cases_accepts_typed_prng_keys(case):
    """New-style typed keys (jax.random.key) must work in segment_cases and
    produce the same results as the equivalent legacy uint32 key — the key
    batch round-trips through host memory (r5 code-review finding)."""
    from fissure_segmentation_tpu.serving import segment_cases

    img, mask, model, variables = case
    a = segment_cases([img] * 2, [mask] * 2, model.apply, variables,
                      jax.random.key(17), center_x=SHAPE[2] / 2, **CFG)
    b = segment_cases([img] * 2, [mask] * 2, model.apply, variables,
                      jax.random.PRNGKey(17), center_x=SHAPE[2] / 2, **CFG)
    for ra, rb in zip(a, b):
        np.testing.assert_array_equal(ra.kpts, rb.kpts)
        np.testing.assert_array_equal(ra.labelmap, rb.labelmap)
