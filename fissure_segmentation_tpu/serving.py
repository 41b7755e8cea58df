"""One-call CT-case inference: keypoints -> ensemble seg -> fissure meshes.

The reference's serving loop (train.py:179-321) crosses the host<->device
boundary once per stage: keypoint detection, 50x subset ensembling, per-class
Poisson fit, voxelization. On a remote-attached TPU every crossing costs a
round trip plus transfer, so here the WHOLE device part of a case — detector,
subset-ensemble segmentation, per-class spectral PSR and marching tetrahedra
— is fused into ONE jit with transfer-packed outputs:

    keypoints   uint16 zyx voxel indices   (vs int32: 2x smaller)
    validity    bit-packed                  (8x)
    labels      uint8                       (4x)
    inside grid bit-packed sign of phi      (512x vs f32 phi)
    meshes      dedup-indexed: uint16 vertex indices + one int32 edge key
                and uint16 fraction per UNIQUE vertex (V/T ~ 0.52) — ~1.8x
                smaller than uint16 coordinate soups, and exact to 1/65535
                of a PSR cell (marching_tetrahedra_packed)

so a full case costs one dispatch + one ~0.95 MB fetch. Host work after the
fetch is only the component/mask filtering of surface_fitting._host_mesh_filter
(native C++ connected components) and the optional labelmap rasterization.

Stage parity: keypoints/{foerstner,hessian,extraction}.py, models/ensemble.py
(point_seg_net.py:21-48 protocol), postprocess/surface_fitting.py
(train.py:283-321 chain).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .keypoints.extraction import get_cnn_keypoints, get_enhancement_keypoints
from .keypoints.foerstner import foerstner_keypoints
from .keypoints.hessian import hessian_fissure_enhancement
from .models.ensemble import ensemble_predict
from .postprocess.surface_fitting import (_batched_psr_mc_packed,
                                          _decode_packed_mesh,
                                          _host_mesh_filter)
from .utils.coords import kpts_to_grid


@dataclass
class CaseResult:
    """Host-side result of one segmented CT case."""
    kpts: np.ndarray          # (n_valid, 3) int zyx voxel indices
    labels: np.ndarray        # (n_valid,) predicted class per keypoint
    meshes: list              # per foreground class: (tris (T,3,3) world xyz, valid (T,))
    labelmap: np.ndarray | None   # (D, H, W) uint8, if requested


@functools.partial(
    jax.jit,
    static_argnames=("apply_fn", "kp_mode", "max_kpts", "sample_points",
                     "n_runs_min", "subset_batch", "grid_res", "sig",
                     "k_normals", "max_tris", "max_verts", "num_fg_classes",
                     "fissure_mu", "fissure_sigma", "approx_top_k",
                     "cnn_apply_fn", "cnn_dtype", "class_cap"))
def _device_case(vol, mask, variables, rng, *, apply_fn, kp_mode, max_kpts,
                 sample_points, n_runs_min, subset_batch, grid_res, sig,
                 k_normals, max_tris, num_fg_classes, fissure_mu,
                 fissure_sigma, approx_top_k=False, max_verts=16384,
                 cnn_apply_fn=None, cnn_variables=None, cnn_dtype=None,
                 class_cap=8192):
    """Device half of a case: detector + ensemble + PSR + marching tets.

    `vol` is the CT volume (foerstner/enhancement modes; also cnn mode when
    `cnn_apply_fn` is given — the pre-seg CNN forward then runs INSIDE this
    dispatch) or the pre-seg CNN softmax volume (cnn mode, (D, H, W, C)).
    """
    if kp_mode == "foerstner":
        kpts, valid, _ = foerstner_keypoints(vol, mask, sigma=0.5, d=5,
                                             thresh=1e-8, max_kpts=max_kpts,
                                             approx_top_k=approx_top_k)
        shape = vol.shape
    elif kp_mode == "enhancement":
        enh = hessian_fissure_enhancement(vol, fissure_mu=fissure_mu,
                                          fissure_sigma=fissure_sigma)
        kpts, valid = get_enhancement_keypoints(enh, max_kpts=max_kpts)
        shape = vol.shape
    elif kp_mode == "cnn":
        if cnn_apply_fn is not None:
            from .models.seg_cnn import predict_full_volume
            soft = predict_full_volume(cnn_apply_fn, cnn_variables, vol,
                                       dtype=cnn_dtype)
            shape = vol.shape
        else:
            soft, shape = vol, vol.shape[:-1]
        # want_features=False: the ensemble below feeds coords only, and the
        # 4x 5^3 trilinear patch gather is the tail's dominant cost.
        # approx_top_k here is distribution-preserving (random scores — see
        # get_cnn_keypoints), unlike the foerstner branch where it trades
        # ~5% recall.
        kpts, valid, _ = get_cnn_keypoints(soft, mask, max_kpts=max_kpts,
                                           rng=jax.random.fold_in(rng, 1),
                                           want_features=False,
                                           approx_top_k=approx_top_k)
    else:
        raise ValueError(f'serving does not support kp_mode "{kp_mode}"')

    world = kpts[:, ::-1].astype(jnp.float32)          # zyx -> xyz voxel
    coords = kpts_to_grid(world, shape)                # [-1, 1] grid xyz
    coords = jnp.where(valid[:, None], coords, -1.0)

    probs = ensemble_predict(apply_fn, variables, coords, rng,
                             sample_points=sample_points,
                             n_runs_min=n_runs_min,
                             subset_batch=subset_batch)
    pred = jnp.argmax(probs, axis=-1)

    class_valid = jnp.stack(
        [valid & (pred == c) for c in range(1, num_fg_classes + 1)])
    inside_bits, idx, vkey, vfrac_q, n_tris, n_verts = _batched_psr_mc_packed(
        coords[:, ::-1], class_valid, grid_res, sig, k_normals, max_tris,
        max_verts, class_cap)

    return (jnp.clip(kpts, 0, 65535).astype(jnp.uint16),
            jnp.packbits(valid), pred.astype(jnp.uint8),
            inside_bits, idx, vkey, vfrac_q, n_tris, n_verts)


def segment_case(vol, mask, apply_fn, variables, rng, *,
                 kp_mode: str = "foerstner", max_kpts: int = 20000,
                 sample_points: int = 2048, n_runs_min: int = 50,
                 subset_batch: int = 5, grid_res=(64, 64, 64),
                 sig: float = 4.0, k_normals: int = 30,
                 max_tris: int = 24000, max_verts: int = 16384,
                 num_fg_classes: int = 3,
                 fissure_mu: float = -313.5, fissure_sigma: float = 62.6,
                 rights=None, center_x: float | None = None,
                 lung_mask_filter: np.ndarray | None = None,
                 mask_dilate_radius: int = 1, crop_to_bbox: bool = True,
                 make_labelmap: bool = True,
                 approx_top_k: bool = False,
                 cnn_apply_fn=None, cnn_variables=None,
                 cnn_dtype=None, class_cap: int = 8192) -> CaseResult:
    """Segment one CT case end-to-end (train.py:179-321 serving chain).

    :param vol: (D, H, W) CT volume at unit spacing — or, for
        ``kp_mode="cnn"`` WITHOUT ``cnn_apply_fn``, the (D, H, W, C) pre-seg
        softmax volume (from models.seg_cnn.predict_full_volume)
    :param cnn_apply_fn: optional pre-seg CNN apply for ``kp_mode="cnn"``;
        when given, `vol` is the raw CT and the full-volume CNN forward is
        FUSED into the same device dispatch as detector+ensemble+PSR (saves
        a dispatch round trip and the 256^3*C softmax round trip through HBM
        between two executables). `cnn_variables` are its params;
        `cnn_dtype` its compute dtype (e.g. jnp.bfloat16).
    :param mask: (D, H, W) bool lung mask (keypoint restriction)
    :param apply_fn: point-seg model apply (variables, (B, S, 3), train=False)
    :param rights: per-fg-class right-lung flags for component selection
        (default: fissure convention [False, True, True][:num_fg_classes])
    :param lung_mask_filter: optional mask restricting the fitted meshes
        (reference mask_out_verts_from_mesh, train.py:300)
    :param approx_top_k: use the TPU two-stage `approx_max_k` for the
        Förstner keypoint extraction instead of the exact masked top-k
        (~0.95 recall; the reference itself randomly subsamples past
        MAX_KPTS, keypoint_extraction.py:144-151)
    :param class_cap: per-class point budget for the surface fit — each
        class's keypoints are compacted to this fixed size before the
        O(N^2) normals kNN (postprocess.surface_fitting._compact_valid);
        exact as long as no class holds more than `class_cap` keypoints
    :param center_x: left/right split plane in voxels for component selection
    :return: CaseResult with host-side keypoints, labels, per-class meshes
        (world xyz) and optionally the rasterized labelmap.
    """
    dispatched = _dispatch_case(
        jnp.asarray(vol), jnp.asarray(mask), variables, rng,
        apply_fn=apply_fn, kp_mode=kp_mode, max_kpts=max_kpts,
        sample_points=sample_points, n_runs_min=n_runs_min,
        subset_batch=subset_batch, grid_res=grid_res, sig=sig,
        k_normals=k_normals, max_tris=max_tris, max_verts=max_verts,
        num_fg_classes=num_fg_classes, fissure_mu=fissure_mu,
        fissure_sigma=fissure_sigma, approx_top_k=approx_top_k,
        cnn_apply_fn=cnn_apply_fn, cnn_variables=cnn_variables,
        cnn_dtype=cnn_dtype, class_cap=class_cap)
    return _finish_case(dispatched, vol, mask, rights=rights,
                        center_x=center_x, lung_mask_filter=lung_mask_filter,
                        mask_dilate_radius=mask_dilate_radius,
                        crop_to_bbox=crop_to_bbox,
                        make_labelmap=make_labelmap,
                        cnn_apply_fn=cnn_apply_fn)


def segment_cases(volumes, masks, apply_fn, variables, rng, *,
                  window: int = 3, timings: list | None = None,
                  pipeline_threads: bool = True, **kwargs):
    """Throughput-pipelined multi-case serving.

    `segment_case` is latency-shaped: dispatch -> fetch -> host filter per
    case, so the host tail (packed fetch + native component filter +
    labelmap rasterization) serializes with the device. This driver runs a
    THREE-stage pipeline instead:

      main thread   async-dispatches case i+2's fused device graph
      fetch thread  blocks in case i+1's bulk `device_get` (pure I/O wait —
                    the GIL is released, and the transfers were pre-staged
                    with copy_to_host_async at dispatch time)
      host thread   decodes/filters/rasterizes case i (numpy + native C++,
                    which releases the GIL during the heavy calls)

    so steady-state throughput approaches 1/max(device, fetch, host) —
    device-bound on the bench chip (~132 ms compute vs ~60 ms fetch +
    ~90 ms host) — instead of the 1/(device+fetch+host) of a serial loop.
    The reference processes its test set strictly serially
    (train.py:179-321). Results are IDENTICAL to per-case segment_case
    calls (same executables, same inputs; threading only reorders waits —
    tests/test_serving.py pins equality). Throughput numbers live in the
    newest ``BENCH_r*.json`` (README headline block is generated from it).

    Per-case rng keys are ``fold_in(rng, i)``, derived in ONE jitted call:
    an eager per-case `fold_in` costs a dispatch round trip on a
    tunnel-attached chip and its first use pays a compile (the r4 driver's
    single-cold-shot pipelined measurement ate exactly that).

    :param volumes: iterable of (D, H, W) arrays (device or host)
    :param masks: iterable of matching lung masks
    :param window: max cases in flight across the three stages (3 keeps
        every stage busy; each in-flight case holds its ~1 MB packed
        outputs plus its input volume on device)
    :param timings: optional list; appends one per-case dict
        (``dispatch_s`` always; threaded mode adds ``fetch_s``/``host_s``,
        the fallback ``finish_s``) for throughput diagnosis
    :param pipeline_threads: run fetch and host stages on two worker
        threads (default); False falls back to the single-threaded
        window loop (dispatch-ahead only)
    :param kwargs: forwarded to segment_case (kp_mode, grid_res, ...)
    :return: list of CaseResult
    """
    import time

    volumes, masks = list(volumes), list(masks)
    if len(volumes) != len(masks):
        raise ValueError(f"{len(volumes)} volumes vs {len(masks)} masks")

    # split segment_case's kwargs: device-dispatch args vs host-stage args
    import inspect
    host_only = {"rights", "center_x", "lung_mask_filter",
                 "mask_dilate_radius", "crop_to_bbox", "make_labelmap"}
    sig = inspect.signature(segment_case)
    positional = {"vol", "mask", "apply_fn", "variables", "rng"}
    bad = set(kwargs) - (set(sig.parameters) - positional)
    if bad:
        raise TypeError(f"unknown kwargs: {sorted(bad)}")

    n = len(volumes)
    # one jitted fold_in for all per-case keys, then host-resident rows so
    # per-case slicing costs no device round trip. New-style typed PRNG
    # keys (jax.random.key) cannot round-trip through numpy directly —
    # carry their raw uint32 key data and re-wrap per case.
    if n:
        keys_arr = _fold_in_batch(rng, n)
        if jnp.issubdtype(keys_arr.dtype, jax.dtypes.prng_key):
            impl = jax.random.key_impl(rng)
            keys = np.asarray(jax.random.key_data(keys_arr))

            def _case_key(row):
                return jax.random.wrap_key_data(jnp.asarray(row), impl=impl)
        else:
            keys = np.asarray(keys_arr)
            _case_key = jnp.asarray
    dev_kw = {k: v for k, v in kwargs.items() if k not in host_only}

    results: list = [None] * n

    def dispatch(i):
        t0 = time.perf_counter()
        out = _dispatch_case(jnp.asarray(volumes[i]), jnp.asarray(masks[i]),
                             variables, _case_key(keys[i]),
                             apply_fn=apply_fn, **dev_kw)
        return out, time.perf_counter() - t0

    if pipeline_threads and n > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(1) as fetch_pool, \
                ThreadPoolExecutor(1) as host_pool:

            def fetch_job(disp):
                t0 = time.perf_counter()
                fetched = _fetch_case(disp)
                return fetched, time.perf_counter() - t0

            def host_job(i, fetch_fut, tm):
                fetched, fetch_s = fetch_fut.result()
                t0 = time.perf_counter()
                res = _finish_case(fetched, volumes[i], masks[i], **kwargs)
                if tm is not None:
                    tm["fetch_s"] = fetch_s
                    tm["host_s"] = time.perf_counter() - t0
                return res

            host_futs = [None] * n
            tms = [({} if timings is not None else None)
                   for _ in range(n)]
            for i in range(n):
                disp, d_s = dispatch(i)
                if tms[i] is not None:
                    tms[i]["dispatch_s"] = d_s
                ffut = fetch_pool.submit(fetch_job, disp)
                host_futs[i] = host_pool.submit(host_job, i, ffut, tms[i])
                if i + 1 >= window:
                    results[i + 1 - window] = host_futs[i + 1 - window] \
                        .result()
            for i in range(max(0, n - window + 1), n):
                results[i] = host_futs[i].result()
        if timings is not None:
            timings.extend(tms)
        return results

    # single-threaded fallback: dispatch-ahead window only
    pending: list = []  # (index, device outputs, timing dict)

    def finish(idx, out, tm):
        t0 = time.perf_counter()
        results[idx] = _finish_case(out, volumes[idx], masks[idx], **kwargs)
        if tm is not None:
            tm["finish_s"] = time.perf_counter() - t0
            timings.append(tm)

    for i in range(n):
        tm = {} if timings is not None else None
        out, d_s = dispatch(i)
        if tm is not None:
            tm["dispatch_s"] = d_s
        pending.append((i, out, tm))
        if len(pending) >= window:
            finish(*pending.pop(0))
    for idx, out, tm in pending:
        finish(idx, out, tm)
    return results


@functools.partial(jax.jit, static_argnames=("n",))
def _fold_in_batch(rng, n: int):
    """fold_in(rng, i) for i in range(n), one dispatch (see segment_cases)."""
    return jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(n))


def _dispatch_case(vol, mask, variables, rng, *, apply_fn,
                   kp_mode="foerstner", max_kpts=20000, sample_points=2048,
                   n_runs_min=50, subset_batch=5, grid_res=(64, 64, 64),
                   sig=4.0, k_normals=30, max_tris=24000, max_verts=16384,
                   num_fg_classes=3, fissure_mu=-313.5, fissure_sigma=62.6,
                   approx_top_k=False, cnn_apply_fn=None, cnn_variables=None,
                   cnn_dtype=None, class_cap=8192):
    """Async-dispatch the fused device half (no blocking, no transfer)."""
    return _device_case(
        vol, mask, variables, rng, apply_fn=apply_fn, kp_mode=kp_mode,
        max_kpts=max_kpts, sample_points=sample_points,
        n_runs_min=n_runs_min, subset_batch=subset_batch,
        grid_res=tuple(grid_res), sig=sig, k_normals=k_normals,
        max_tris=max_tris, max_verts=int(max_verts),
        num_fg_classes=num_fg_classes, fissure_mu=fissure_mu,
        fissure_sigma=fissure_sigma, approx_top_k=approx_top_k,
        cnn_apply_fn=cnn_apply_fn, cnn_variables=cnn_variables,
        cnn_dtype=cnn_dtype, class_cap=int(class_cap)), kp_mode, max_kpts, \
        grid_res, num_fg_classes


def _issue_async_copies(out):
    """Pre-stage every output buffer's device->host transfer (no-op on
    backends without copy_to_host_async or on numpy leaves)."""
    for leaf in jax.tree_util.tree_leaves(out):
        try:
            leaf.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            break


def _fetch_case(dispatched):
    """Blocking bulk fetch of a dispatched case (the I/O pipeline stage of
    segment_cases' threaded mode); returns `dispatched` with numpy leaves."""
    out, *meta = dispatched
    _issue_async_copies(out)
    return (jax.device_get(out), *meta)


def _finish_case(dispatched, vol, mask, *, rights=None, center_x=None,
                 lung_mask_filter=None, mask_dilate_radius=1,
                 crop_to_bbox=True, make_labelmap=True, **_ignored):
    """Fetch + host half for one dispatched case (mirrors segment_case).

    The fetch is staged: copy_to_host_async is issued for EVERY output
    buffer up front, then the small metadata arrays are fetched first and
    each class's mesh payload (its own device buffer — surface_fitting
    returns idx/vkey/vfrac unstacked) is fetched right before its decode,
    so the transfer of class i+1 streams behind the native decode/filter
    of class i. On the tunnel-attached bench chip this hides most of the
    ~50 ms packed fetch inside the ~60 ms host filter work; a host without
    async copies degrades gracefully to the plain blocking fetch order.
    (`jax.device_get` is an identity on already-fetched numpy leaves, so
    the same code is the host stage of segment_cases' threaded mode.)
    """
    out, kp_mode, max_kpts, grid_res, num_fg_classes = dispatched
    shape = (np.asarray(vol).shape[:-1]
             if kp_mode == "cnn" and _ignored.get("cnn_apply_fn") is None
             and np.asarray(vol).ndim == 4 else np.asarray(vol).shape)
    if rights is None:
        rights = ([False, True, True]
                  + [None] * num_fg_classes)[:num_fg_classes]

    (kpts_q_d, valid_bits_d, pred_d, inside_bits_d, idx_d, vkey_d, vfrac_d,
     n_tris_d, n_verts_d) = out
    _issue_async_copies(out)
    kpts_q, valid_bits, pred, inside_bits, n_tris, n_verts = jax.device_get(
        (kpts_q_d, valid_bits_d, pred_d, inside_bits_d, n_tris_d, n_verts_d))
    valid = np.unpackbits(valid_bits, count=max_kpts).astype(bool)
    kpts = kpts_q.astype(np.int32)
    world = kpts[:, ::-1].astype(np.float32)
    inside = np.unpackbits(inside_bits, axis=-1,
                           count=int(np.prod(grid_res)))
    inside = inside.reshape(num_fg_classes, *grid_res).astype(bool)

    meshes = []
    for i in range(num_fg_classes):
        pts_c = world[valid & (pred == i + 1)]
        n = int(n_tris[i])
        if len(pts_c) < 4 or n == 0:
            meshes.append((np.zeros((0, 3, 3), np.float32),
                           np.zeros(0, bool)))
            continue
        idx_i, vkey_i, vfrac_i = jax.device_get(
            (idx_d[i], vkey_d[i], vfrac_d[i]))
        tris_i = _decode_packed_mesh(idx_i, vkey_i, vfrac_i, n,
                                     int(n_verts[i]), tuple(grid_res))
        meshes.append(_host_mesh_filter(
            inside[i], tris_i, np.ones(n, bool), pts_c, shape,
            tuple(grid_res), lung_mask_filter, mask_dilate_radius,
            rights[i], center_x, crop_to_bbox))

    labelmap = None
    if make_labelmap:
        from .postprocess.surface_fitting import mesh_to_labelmap
        labelmap = mesh_to_labelmap(meshes, shape)

    return CaseResult(kpts=kpts[valid], labels=pred[valid].astype(np.int32),
                      meshes=meshes, labelmap=labelmap)
