"""Golden-value parity tests against the reference PyTorch implementation.

The reference repo is mounted read-only at /root/reference and its pure-torch
modules (utils/image_utils.py, data_processing/foerstner.py,
losses/dice_loss.py, models/dgcnn.py create_neighbor_features,
data_processing/point_features.py mind, models/dpsr_net.py DPSR) are imported
directly (torch CPU is installed) and compared numerically against our JAX
implementations. Third-party wheels the reference imports at module level but
never calls on these paths (open3d, pytorch3d, igl, trimesh, thop, ...) are
auto-stubbed with MagicMock; in-repo modules `data`/`constants` are stubbed
too so importing `point_features` doesn't drag in the whole dataset layer.

These pin the cross-framework numerics the round-1 review flagged as
unverified claims (kNN/edge features, Förstner distinctiveness, GDL/CE,
MIND-SSC, spectral DPSR, plateau-scheduler trace).
"""
import importlib
import os
import sys
from unittest import mock

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

# in-repo modules of the reference that pull in the heavy dataset / path
# layer; the functions under test never touch them
_PRESTUB = ["data", "constants", "pointops_cuda", "torchvision"]


def import_ref(modname: str):
    """Import a reference module, auto-stubbing missing 3rd-party deps."""
    if REF not in sys.path:
        sys.path.append(REF)  # append: nothing may shadow our own modules
        for m in _PRESTUB:
            sys.modules.setdefault(m, mock.MagicMock())
        import inspect
        if not hasattr(inspect, "getargspec"):
            # removed in py3.11; reference modelio.py still calls it
            def _getargspec(fn):
                fa = inspect.getfullargspec(fn)
                return fa.args, fa.varargs, fa.varkw, fa.defaults
            inspect.getargspec = _getargspec
    for _ in range(64):
        try:
            return importlib.import_module(modname)
        except (ModuleNotFoundError, ImportError) as err:
            missing = getattr(err, "name", None)
            if not missing or missing == modname or missing.startswith(
                    ("fissure_segmentation", "jax", "numpy", "torch.")):
                raise
            sys.modules[missing] = mock.MagicMock()
    raise RuntimeError(f"could not import reference module {modname}")


def t2n(x):
    return x.detach().cpu().numpy()


# ---------------------------------------------------------------- filters

def test_filter_1d_and_smooth_match_reference(rng):
    ref = import_ref("utils.image_utils")
    from fissure_segmentation_tpu.utils.filters import filter_1d, smooth

    img = rng.normal(size=(6, 7, 8)).astype(np.float32)
    timg = torch.from_numpy(img)[None, None]
    weight = np.array([1.0, -8.0, 0.0, 8.0, -1.0], np.float32) / 12.0
    for dim in range(3):
        want = t2n(ref.filter_1d(timg, torch.from_numpy(weight), dim))[0, 0]
        got = np.asarray(filter_1d(jnp.asarray(img), jnp.asarray(weight), dim))
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=f"dim={dim}")

    for sigma in (0.8, 1.4, 2.0):
        want = t2n(ref.smooth(timg, sigma))[0, 0]
        got = np.asarray(smooth(jnp.asarray(img), sigma))
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=f"s={sigma}")


def test_nms_matches_reference(rng):
    ref = import_ref("utils.image_utils")
    from fissure_segmentation_tpu.utils.filters import max_pool_same

    img = rng.normal(size=(10, 11, 12)).astype(np.float32)
    for k in (3, 5, 9):
        want = t2n(ref.nms(torch.from_numpy(img)[None, None], k))[0, 0]
        got = np.asarray(max_pool_same(jnp.asarray(img), k))
        np.testing.assert_allclose(got, want, atol=0, err_msg=f"k={k}")


# --------------------------------------------------------------- foerstner

def test_foerstner_distinctiveness_matches_reference(rng):
    ref = import_ref("data_processing.foerstner")
    from fissure_segmentation_tpu.keypoints.foerstner import distinctiveness

    img = rng.normal(size=(12, 13, 14)).astype(np.float32)
    sigma = 1.4
    want = t2n(ref.distinctiveness(torch.from_numpy(img)[None, None], sigma))
    got = np.asarray(distinctiveness(jnp.asarray(img), sigma))
    # trace-of-inverse amplifies float error near-singular tensors; compare
    # relatively against the value scale
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want[0, 0], atol=3e-4 * scale, rtol=2e-3)


# ----------------------------------------------------------- knn + edges

def test_knn_indices_match_reference(rng):
    ref = import_ref("utils.general_utils")
    from fissure_segmentation_tpu.ops.knn import knn

    pts = rng.normal(size=(2, 64, 3)).astype(np.float32)
    tpts = torch.from_numpy(pts).transpose(2, 1)  # reference is (B, C, N)
    for self_loop in (False, True):
        want = t2n(ref.knn(tpts, 8, self_loop=self_loop))
        got = np.asarray(knn(jnp.asarray(pts), 8, self_loop=self_loop,
                             use_pallas=False))
        np.testing.assert_array_equal(got, want, err_msg=f"sl={self_loop}")


def test_edge_features_match_reference(rng):
    ref = import_ref("models.dgcnn")
    from fissure_segmentation_tpu.ops.edge import edge_features

    x = rng.normal(size=(2, 32, 5)).astype(np.float32)
    idx = rng.integers(0, 32, size=(2, 32, 6))
    tx = torch.from_numpy(x).transpose(2, 1)          # (B, C, N)
    tidx = torch.from_numpy(idx)                      # (B, N, k)
    want = t2n(ref.create_neighbor_features(tx, k=6, fixed_knn_graph=tidx))
    got = np.asarray(edge_features(jnp.asarray(x), jnp.asarray(idx)))
    # ref layout (B, 2C, N, k) -> ours (B, N, k, 2C)
    want = np.moveaxis(want, 1, -1)
    np.testing.assert_allclose(got, want, atol=1e-6)


# ------------------------------------------------------------------ losses

def test_gdl_ce_nnu_loss_match_reference(rng):
    ref_gdl = import_ref("losses.dice_loss")
    ref_nnu = import_ref("losses.nnu_loss")
    from fissure_segmentation_tpu.losses.segmentation import (
        cross_entropy, generalized_dice_loss, nnu_loss)

    logits = rng.normal(size=(3, 4, 100)).astype(np.float32)  # (B, C, N)
    target = rng.integers(0, 4, size=(3, 100))
    tl, tt = torch.from_numpy(logits), torch.from_numpy(target)
    ours_logits = jnp.asarray(np.moveaxis(logits, 1, -1))     # (B, N, C)
    ours_target = jnp.asarray(target)

    gdl_ref = float(ref_gdl.GDL(apply_nonlin=torch.nn.Softmax(dim=1),
                                batch_dice=True)(tl, tt))
    gdl_ours, _ = generalized_dice_loss(ours_logits, ours_target)
    np.testing.assert_allclose(float(gdl_ours), gdl_ref, atol=1e-5)

    weights = rng.uniform(0.5, 2.0, size=4).astype(np.float32)
    ce_ref = float(torch.nn.CrossEntropyLoss(torch.from_numpy(weights))(tl, tt))
    ce_ours, _ = cross_entropy(ours_logits, ours_target, jnp.asarray(weights))
    np.testing.assert_allclose(float(ce_ours), ce_ref, atol=1e-5)

    loss_ref, comps_ref = ref_nnu.NNULoss(torch.from_numpy(weights))(tl, tt)
    loss_ours, comps_ours = nnu_loss(ours_logits, ours_target,
                                     jnp.asarray(weights))
    np.testing.assert_allclose(float(loss_ours), float(loss_ref), atol=1e-5)
    np.testing.assert_allclose(float(comps_ours["CE"]),
                               float(comps_ref["CE"]), atol=1e-5)
    np.testing.assert_allclose(float(comps_ours["GDL"]),
                               float(comps_ref["GDL"]), atol=1e-5)


# -------------------------------------------------------------------- MIND

def test_mind_ssc_matches_reference(rng):
    ref = import_ref("data_processing.point_features")
    from fissure_segmentation_tpu.keypoints.features import mind

    img = rng.normal(size=(10, 11, 12)).astype(np.float32)
    want = t2n(ref.mind(torch.from_numpy(img)[None, None], dilation=2,
                        sigma=0.8, ssc=True))[0]          # (12, D, H, W)
    got = np.asarray(mind(jnp.asarray(img), dilation=2, sigma=0.8, ssc=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


# -------------------------------------------------------------------- DPSR

def test_dpsr_phi_matches_reference(rng):
    ref = import_ref("models.dpsr_net")
    from fissure_segmentation_tpu.ops.dpsr import dpsr_forward

    n = 200
    pts = rng.uniform(-0.8, 0.8, (2, n, 3)).astype(np.float32)
    normals = rng.normal(size=(2, n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)

    dpsr = ref.DPSR(res=(16, 16, 16), sig=3.0)
    want = t2n(dpsr(torch.from_numpy(pts), torch.from_numpy(normals)))
    got = np.asarray(dpsr_forward(jnp.asarray(pts), jnp.asarray(normals),
                                  res=(16, 16, 16), sig=3.0))
    assert got.shape == want.shape == (2, 16, 16, 16)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_point_rasterize_matches_reference_torch(rng):
    ref = import_ref("models.dpsr_utils")
    from fissure_segmentation_tpu.ops.splat import point_rasterize

    pts = rng.uniform(0.05, 0.95, (2, 64, 3)).astype(np.float32)
    vals = rng.normal(size=(2, 64, 3)).astype(np.float32)
    want = t2n(ref.point_rasterize(torch.from_numpy(pts),
                                   torch.from_numpy(vals), (8, 9, 10)))
    got = np.asarray(point_rasterize(jnp.asarray(pts), jnp.asarray(vals),
                                     (8, 9, 10)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_interp_matches_reference_torch(rng):
    ref = import_ref("models.dpsr_utils")
    from fissure_segmentation_tpu.ops.splat import grid_interp

    grid = rng.normal(size=(2, 8, 9, 10, 4)).astype(np.float32)
    pts = rng.uniform(0.05, 0.95, (2, 32, 3)).astype(np.float32)
    want = t2n(ref.grid_interp(torch.from_numpy(grid), torch.from_numpy(pts),
                               batched=True))
    got = np.asarray(grid_interp(jnp.asarray(grid), jnp.asarray(pts)))
    np.testing.assert_allclose(got, want, atol=1e-5)


# -------------------------------------------------------------------- LPCA

def _bumpy_shapes(rng, n=24, grid=10):
    """Synthetic corresponding point sets with BOTH global (scale) and
    localized (per-corner bump) variation — the regime LPCA targets."""
    gy, gx = np.meshgrid(np.linspace(-1, 1, grid), np.linspace(-1, 1, grid),
                         indexing="ij")
    base = np.stack([gx.ravel(), gy.ravel(), np.zeros(grid * grid)], -1)
    centers = np.array([[-1, -1, 0], [1, 1, 0], [-1, 1, 0], [1, -1, 0]],
                       np.float64)
    shapes = []
    for _ in range(n):
        s = base * (1.0 + 0.05 * rng.standard_normal())
        for c in centers:
            w = np.exp(-((base - c) ** 2).sum(-1) / 0.18)
            s = s + np.array([0, 0, 1.0]) * w[:, None] * \
                0.3 * rng.standard_normal()
        shapes.append(s)
    return np.asarray(shapes)                       # (N, P, 3)


def _recon_rmse(x, mean, basis):
    xc = x - mean
    rec = mean + (xc @ basis) @ basis.T
    return float(np.sqrt(((rec - x) ** 2).mean()))


def test_lssm_matches_reference_lpca(rng):
    """fit_lssm vs the reference kernelized LPCA (numpy, imported from
    /root/reference): same schedule/merge algorithm, with our dense eigh
    replacing the reference's randomized sampled eigensolver — so we compare
    reconstruction quality and model size, not bitwise bases."""
    ref_mod = import_ref("shape_model.LPCA.model")
    from fissure_segmentation_tpu.shape_model.lssm import fit_lssm

    shapes = _bumpy_shapes(rng)
    n, p, _ = shapes.shape
    x = shapes.reshape(n, -1)

    np.random.seed(0)  # the reference eigensolver samples with np.random
    ref = ref_mod.LPCA(num_levels=3, target_variation=0.95)
    ref.klpca(x.T.copy())                           # (F, N) data matrix
    ref_basis = np.asarray(ref.eigenvectors)
    ref_mean = np.asarray(ref.mean_vector).reshape(1, -1)

    ours = fit_lssm(shapes, num_levels=3, target_variance=0.95)
    our_basis = np.asarray(ours.eigenvectors)[0]
    our_mean = np.asarray(ours.mean_shape)

    np.testing.assert_allclose(our_mean, ref_mean, atol=1e-5)
    # similar model size (sampled vs exact eigensolver can differ slightly)
    assert abs(our_basis.shape[1] - ref_basis.shape[1]) <= \
        max(3, ref_basis.shape[1] // 4), (our_basis.shape, ref_basis.shape)

    err_ref = _recon_rmse(x, ref_mean, ref_basis)
    err_ours = _recon_rmse(x, our_mean, our_basis)
    # exact eigensolver must not be worse than the sampled approximation
    # (small slack for differing mode counts)
    assert err_ours <= err_ref * 1.2 + 1e-6, (err_ours, err_ref)

    # localized levels must beat a plain PCA cut at the same variance on
    # this localized-variation data (the point of LPCA)
    from fissure_segmentation_tpu.shape_model.ssm import fit_ssm
    global_ssm = fit_ssm(shapes, target_variance=0.95)
    err_global = _recon_rmse(x, np.asarray(global_ssm.mean_shape),
                             np.asarray(global_ssm.eigenvectors)[0])
    assert err_ours <= err_global + 1e-9


# --------------------------------------------------------------- scheduler

def test_plateau_scheduler_trace_matches_torch():
    from fissure_segmentation_tpu.train.trainer import _PlateauScheduler

    lr0, factor, patience, cooldown = 1e-3, 0.8, 5, 5
    min_lr = 0.05 * lr0
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr0)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=factor, patience=patience, threshold=1e-4,
        threshold_mode="rel", cooldown=cooldown, min_lr=min_lr)
    ours = _PlateauScheduler(lr0, factor=factor, patience=patience,
                             threshold=1e-4, cooldown=cooldown, min_lr=min_lr)

    rng = np.random.default_rng(0)
    # improving -> plateau -> noisy plateau -> slow improvement
    losses = np.concatenate([
        1.0 / np.arange(1, 15),
        np.full(20, 0.07),
        0.07 + 0.001 * rng.standard_normal(30),
        0.07 * np.exp(-0.001 * np.arange(40)),
    ])
    trace_ref, trace_ours = [], []
    for l in losses:
        sch.step(float(l))
        trace_ref.append(opt.param_groups[0]["lr"])
        trace_ours.append(ours.step(float(l)))
    np.testing.assert_allclose(trace_ours, trace_ref, rtol=1e-12)


def test_box_smooth3_matches_torch_avg_pool3d(rng):
    """Registration displacement smoothing == the reference's triple
    avg_pool3d(k=3, stride=1, padding=1) chain (adam_registration.py:112)."""
    from fissure_segmentation_tpu.shape_model.adam_registration import \
        _box_smooth3

    disp = rng.standard_normal((6, 7, 8, 3)).astype(np.float32)
    ours = np.asarray(_box_smooth3(jnp.asarray(disp)))

    t = torch.from_numpy(disp).permute(3, 0, 1, 2).unsqueeze(0)  # (1,3,d,h,w)
    for _ in range(3):
        t = torch.nn.functional.avg_pool3d(t, 3, stride=1, padding=1)
    ref = t.squeeze(0).permute(1, 2, 3, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_grid_sample_volume_matches_torch(rng):
    """Our grid_sample equivalent (registration cost + warping) == torch
    F.grid_sample bilinear/zeros with align_corners=False."""
    from fissure_segmentation_tpu.utils.sampling import grid_sample_volume

    vol = rng.standard_normal((2, 9, 10, 11)).astype(np.float32)
    coords = rng.uniform(-1.1, 1.1, (50, 3)).astype(np.float32)  # incl. OOB

    ours = np.asarray(grid_sample_volume(jnp.asarray(vol),
                                         jnp.asarray(coords),
                                         mode="bilinear",
                                         padding_mode="zeros"))  # (2, 50)
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(vol).unsqueeze(0),                     # (1,2,d,h,w)
        torch.from_numpy(coords).view(1, -1, 1, 1, 3),
        mode="bilinear", padding_mode="zeros",
        align_corners=False).squeeze().numpy()                  # (2, 50)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.slow
def test_tps_and_thin_plate_dense_match_reference(rng):
    """TPS radial-basis fit/eval and the dense displacement field
    (point_cloud_registration.py:24-90), incl. the align_corners=True
    trilinear upsample semantics of the final F.interpolate."""
    ref = import_ref("shape_model.point_cloud_registration")
    from fissure_segmentation_tpu.shape_model.registration import (
        TPS, thin_plate_dense)

    c = rng.uniform(-0.9, 0.9, (24, 3)).astype(np.float32)
    f = rng.normal(size=(24, 3)).astype(np.float32) * 0.1

    theta_t = ref.TPS.fit(torch.from_numpy(c), torch.from_numpy(f), lambd=0.1)
    x = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
    z_t = ref.TPS.z(torch.from_numpy(x), torch.from_numpy(c), theta_t)

    with jax.default_matmul_precision("float32"):
        theta_j = TPS.fit(jnp.asarray(c), jnp.asarray(f), lambd=0.1)
        z_j = TPS.z(jnp.asarray(x), jnp.asarray(c), theta_j)
    np.testing.assert_allclose(np.asarray(theta_j), t2n(theta_t),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(z_j), t2n(z_t), rtol=1e-3,
                               atol=1e-4)

    field_t = ref.thin_plate_dense(torch.from_numpy(c[None]),
                                   torch.from_numpy(f[None]),
                                   shape=(16, 20, 24), step=4, lambd=0.1)
    with jax.default_matmul_precision("float32"):
        field_j = thin_plate_dense(jnp.asarray(c[None]), jnp.asarray(f[None]),
                                   (16, 20, 24), step=4, lambd=0.1)
    np.testing.assert_allclose(np.asarray(field_j), t2n(field_t),
                               rtol=1e-3, atol=1e-4)


def test_batch_recall_loss_matches_reference(rng):
    """BatchRecallLoss (recall_loss.py:9-27): CE weighted by the batch
    false-negative rate per class, incl. torch's weighted-mean
    normalization and the binary_recall eps (metrics.py:144-148)."""
    ref = import_ref("losses.recall_loss")
    from fissure_segmentation_tpu.losses.segmentation import batch_recall_loss

    logits = rng.normal(size=(3, 4, 50)).astype(np.float32)  # (B, C, N)
    targets = rng.integers(0, 4, size=(3, 50))

    loss_t = ref.BatchRecallLoss()(torch.from_numpy(logits),
                                   torch.from_numpy(targets))
    with jax.default_matmul_precision("float32"):
        loss_j, _ = batch_recall_loss(
            jnp.asarray(logits.transpose(0, 2, 1)), jnp.asarray(targets))
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)


def test_batch_dice_and_binary_recall_match_reference(rng):
    """Hard per-class Dice + binary recall/precision (metrics.py:130-153)."""
    ref = import_ref("metrics")
    from fissure_segmentation_tpu.metrics import (batch_dice,
                                                  binary_precision,
                                                  binary_recall)

    pred = rng.integers(0, 4, size=(3, 11, 13)).astype(np.int64)
    targ = rng.integers(0, 4, size=(3, 11, 13)).astype(np.int64)

    dice_t = ref.batch_dice(torch.from_numpy(pred), torch.from_numpy(targ), 4)
    dice_j = batch_dice(jnp.asarray(pred), jnp.asarray(targ), 4)
    np.testing.assert_allclose(np.asarray(dice_j), t2n(dice_t), rtol=1e-6)

    rec_t = ref.binary_recall(torch.from_numpy(pred), torch.from_numpy(targ))
    rec_j = binary_recall(jnp.asarray(pred), jnp.asarray(targ))
    np.testing.assert_allclose(np.asarray(rec_j), t2n(rec_t), rtol=1e-6)

    prc_t = ref.binary_precision(torch.from_numpy(pred),
                                 torch.from_numpy(targ))
    prc_j = binary_precision(jnp.asarray(pred), jnp.asarray(targ))
    np.testing.assert_allclose(np.asarray(prc_j), t2n(prc_t), rtol=1e-6)
