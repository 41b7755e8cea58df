"""Benchmark: per-case pipelines + training throughput on one chip.

Primary metric (the JSON "value"): the reference's *total* per-case runtime
definition for the headline DGCNN+Förstner pipeline (BASELINE.md: keypoint
preprocessing + inference + post-processing; thesis pareto figure
performance_time_plot.py:31, 1.352 s/case on the reference GPU node),
measured as wall-clock of the FUSED serving path
(fissure_segmentation_tpu/serving.py:segment_case): Foerstner detection on
the 256^3 CT + 50x2048-subset DGCNN ensemble (point_seg_net.py:21-48
protocol, canonical k=40 static graph) + per-class spectral PSR + marching
tetrahedra in ONE device dispatch, one packed ~1.5 MB fetch, then the
native-C++ host component filter and SAT labelmap rasterization.

The "details" dict additionally reports (all on the same chip):
  * the BASELINE.json north-star training metric — clouds/sec/chip for the
    canonical DGCNN seg fwd+bwd step (batch 32, 2048 pts, k=40 static,
    NNU loss, Adam), measured as chained optimizer steps in one jit;
  * the Hessian-keypoint pipeline (reference: 36.81 s/case,
    performance_time_plot.py:32): Hessian plate-filter enhancement of the
    256^3 volume + top-k keypoints + the same ensemble + stage B;
  * the pre-seg-CNN-keypoint pipeline (reference: 6.786 s/case,
    performance_time_plot.py:33): single-pass full-volume MobileNetASPP
    forward + foreground keypoints + the same ensemble + stage B, ALL in
    one fused dispatch (segment_case(cnn_apply_fn=...); the reference runs
    a 27-patch Gaussian-blended sliding window instead);
  * the DGCNN+PC-AE pipeline (reference: 0.418 s/case,
    performance_time_plot.py:34): same keypoints + ensemble, then
    per-class masked FPS + folding-net mesh decode instead of PSR.

Timing methodology: on remote-attached TPUs (axon tunnel) block_until_ready
can be a no-op and fetching a full array measures the tunnel, not the chip;
device stages therefore chain REPS data-dependent cases inside ONE jit via
lax.scan and fetch a single scalar. Stage B and the CNN sliding window
inherently cross the host<->device boundary, so they are wall-clock timed
after a warm-up — tunnel transfer makes those conservative (pessimistic)
estimates vs. a colocated host. Serving rows report the MEDIAN of warm
repeats (r5; mins are in details): the tunnel's ±50 ms per-call sync jitter
exceeds real config deltas, so min-of-N orderings flipped between sessions
(r3/r4 fast-vs-exact). The exact and fast variants are timed interleaved so
both face the same session conditions; the pipelined row runs a warm-up
batch then takes the best of 2 timed batches with per-case instrumentation.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", "details"}.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache(min_compile_secs=1.0)

REFERENCE_CASE_SECONDS = 1.352          # performance_time_plot.py:31
REFERENCE_HESSIAN_SECONDS = 36.81       # performance_time_plot.py:32
REFERENCE_CNN_SECONDS = 6.786           # performance_time_plot.py:33
REFERENCE_PCAE_SECONDS = 0.418          # performance_time_plot.py:34
SHAPE = (256, 256, 256)
MAX_KPTS = 20000


def _timeit(fn, repeats=3):
    """min wall time of fn() (fn must synchronize internally)."""
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def _jit_init(model, rng, *args, **static_kw):
    """model.init under jit: ONE dispatch instead of one per parameter op.

    Eager flax init issues hundreds of tiny device ops; on the tunnel-attached
    bench chip each pays the ~39 ms dispatch RTT (~60 s for the canonical
    DGCNN — measured 2026-08-20, vs 2.4 s jitted). Not a chip cost: a
    colocated host pays ms either way."""
    return jax.jit(
        lambda r, *a: model.init(r, *a, train=False, **static_kw))(rng, *args)


def bench_train_throughput(dtype=None, tag="", knn_recall=None):
    """North-star: clouds/sec/chip, DGCNN seg fwd+bwd at the canonical
    config (BASELINE.md:21 — batch 32, 2048 pts, k=40, static graph).

    Called once at f32 and once at dtype=bfloat16 — the bf16 compute path
    is the TPU analog of the reference's AMP autocast training
    (model_trainer.py:92), params kept f32."""
    import optax
    from fissure_segmentation_tpu.losses.segmentation import nnu_loss
    from fissure_segmentation_tpu.models import DGCNNSeg

    B, N, REPS = 32, 2048, 8
    model = DGCNNSeg(k=40, in_features=3, num_classes=4, dynamic=False,
                     dtype=dtype, knn_recall=knn_recall)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
    y = jax.random.randint(jax.random.PRNGKey(1), (B, N), 0, 4)
    variables = _jit_init(model, jax.random.PRNGKey(2), x)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def chain(params, batch_stats, opt_state, x, y):
        def body(carry, i):
            params, bs, opt = carry

            def loss(p):
                logits, mut = model.apply(
                    {"params": p, "batch_stats": bs},
                    x * (1.0 + 1e-12 * i), train=True,
                    mutable=["batch_stats"])
                l, _ = nnu_loss(logits, y)
                return l, mut["batch_stats"]

            (l, nbs), g = jax.value_and_grad(loss, has_aux=True)(params)
            upd, opt = tx.update(g, opt, params)
            return (optax.apply_updates(params, upd), nbs, opt), l

        (params, bs, opt), ls = jax.lax.scan(
            body, (params, batch_stats, opt_state),
            jnp.arange(REPS, dtype=jnp.float32))
        return ls[-1]

    args = (variables["params"], variables["batch_stats"], opt_state, x, y)
    float(chain(*args))  # compile + warm up
    dt = _timeit(lambda: float(chain(*args)))
    step_s = dt / REPS
    return {f"train_dgcnn{tag}_clouds_per_sec": round(B / step_s, 1),
            f"train_dgcnn{tag}_step_ms": round(step_s * 1e3, 2)}


def _chained_step_time(params_init, make_loss, reps=4, lr=1e-3):
    """Chained Adam steps in one jit (see bench_train_throughput) for an
    arbitrary (params, aux) loss closure; returns s/step."""
    import optax
    tx = optax.adam(lr)
    opt_state = tx.init(params_init[0])

    @jax.jit
    def chain(params, aux, opt_state):
        def body(carry, i):
            params, aux, opt = carry
            (l, new_aux), g = jax.value_and_grad(
                make_loss, has_aux=True)(params, aux, i)
            upd, opt = tx.update(g, opt, params)
            return (optax.apply_updates(params, upd), new_aux, opt), l

        (params, aux, opt), ls = jax.lax.scan(
            body, (params, aux, opt_state),
            jnp.arange(reps, dtype=jnp.float32))
        return ls[-1]

    args = (*params_init, opt_state)
    float(chain(*args))  # compile + warm up
    return _timeit(lambda: float(chain(*args))) / reps


def bench_family_steps(B=32, N=1024, K=20, dpsr_res=128, dpsr_batch=8):
    """Train-step time for the other trainable families (beyond the DGCNN
    flagship): DPSRNet2 (SoftMesh), DG-SSM, PC-AE FoldingNet — at the
    reference CLI defaults batch 32 / pts 1024 / k 20 / PSR res 128
    (cli_args.py:15,81,110; ours cli/args.py) with each family's actual
    registry loss. The reference publishes no per-family step times (losses
    run AMP-disabled, model_trainer.py:75-76,92); these rows evidence that
    training the whole model zoo is TPU-resident, not just the flagship.
    Non-default args exist for the CPU smoke test (tests/ run tiny shapes)."""
    out = {}
    key = jax.random.PRNGKey(0)

    # ---- PC-AE (FoldingNet plane decoder, chamfer loss) ----
    from fissure_segmentation_tpu.losses.chamfer import chamfer_distance
    from fissure_segmentation_tpu.models.folding_net import DGCNNFoldingNet
    ae = DGCNNFoldingNet(k=K, n_embedding=512, shape_type="plane",
                         n_input_points=N, decode_mesh=False)
    x = jax.random.uniform(key, (B, N, 3), jnp.float32, -0.9, 0.9)
    v = _jit_init(ae, jax.random.PRNGKey(1), x[:1])

    def pcae_loss(params, bs, i):
        out_pts, mut = ae.apply(
            {"params": params, "batch_stats": bs}, x * (1.0 + 1e-12 * i),
            train=True, mutable=["batch_stats"])
        return chamfer_distance(out_pts, x), mut["batch_stats"]

    t = _chained_step_time((v["params"], v["batch_stats"]), pcae_loss)
    out["train_pcae_step_ms"] = round(t * 1e3, 2)

    # ---- DG-SSM (PCA shape model + multi-head regressor, dgssm loss) ----
    from fissure_segmentation_tpu.losses.dgssm import make_dgssm_loss
    from fissure_segmentation_tpu.models import DGSSM
    from fissure_segmentation_tpu.shape_model.ssm import fit_ssm, ssm_project
    rng_np = np.random.default_rng(2)
    base = rng_np.uniform(-0.8, 0.8, (1, N, 3))
    shapes = (base + 0.05 * rng_np.normal(size=(12, N, 3))).astype(np.float32)
    ssm = fit_ssm(shapes, target_variance=0.95)
    xs = jnp.asarray(np.tile(shapes, (3, 1, 1))[:B])
    dgssm = DGSSM(k=K, in_features=3, ssm_modes=ssm.num_modes, dynamic=False)
    v = _jit_init(dgssm, jax.random.PRNGKey(3), xs[:1], ssm)
    dgssm_loss = make_dgssm_loss()
    targ_w = ssm_project(ssm, xs)
    targ_aff = jnp.concatenate([jnp.zeros((B, 6)), jnp.ones((B, 3))], -1)

    def dgssm_loss_fn(params, bs, i):
        pred, mut = dgssm.apply(
            {"params": params, "batch_stats": bs}, xs * (1.0 + 1e-12 * i),
            ssm, train=True, mutable=["batch_stats"])
        l, _ = dgssm_loss(pred, (xs, targ_w, targ_aff))
        return l, mut["batch_stats"]

    t = _chained_step_time((v["params"], v["batch_stats"]), dgssm_loss_fn)
    out["train_dgssm_step_ms"] = round(t * 1e3, 2)

    # ---- DPSRNet2 (SoftMesh: splat + spectral PSR + marching tets at the
    # reference --res 128^3 default, dpsr loss = NNU + surface chamfer) ----
    from fissure_segmentation_tpu.losses.dpsr import make_dpsr_loss
    from fissure_segmentation_tpu.models import DPSRNet2
    # dpsr_batch defaults to 8, not B=32: the 4-class 128^3 per-sample PSR
    # fields put the fwd+bwd footprint at ~1.3 GB/sample, so 16 GB HBM tops
    # out below batch 16 — measured 2026-08-20, and each *failed* compile of
    # the larger graph costs ~3 min wall before XLA reports the OOM, which
    # is why the batch ladder starts at the known-feasible size.
    for b_dpsr in (min(dpsr_batch, B), min(dpsr_batch, B) // 2):
        try:
            model = DPSRNet2(seg_net_class="DGCNN", k=K, in_features=3,
                             num_classes=4, dynamic=False,
                             dpsr_res=(dpsr_res,) * 3,
                             max_tris=24000 if dpsr_res >= 64 else 2000,
                             n_surface_samples=min(2048, 2 * N))
            xd = jax.random.uniform(jax.random.PRNGKey(4), (b_dpsr, N, 3),
                                    jnp.float32, -0.9, 0.9)
            yd = jax.random.randint(jax.random.PRNGKey(5), (b_dpsr, N), 0, 4)
            targ_pts = jax.random.uniform(jax.random.PRNGKey(6),
                                          (b_dpsr, 3, min(2048, 2 * N), 3),
                                          jnp.float32, -0.9, 0.9)
            v = _jit_init(model, jax.random.PRNGKey(7), xd[:1])
            dpsr_loss = make_dpsr_loss()

            def dpsr_loss_fn(params, bs, i):
                pred, mut = model.apply(
                    {"params": params, "batch_stats": bs},
                    xd * (1.0 + 1e-12 * i), train=True,
                    rng=jax.random.PRNGKey(8), mutable=["batch_stats"])
                # flatten the class dim for the per-class chamfer pairing
                # (train_dpsr_net.py loss_fn)
                seg, pts, pvalid = pred
                b, c1, s, _ = pts.shape
                l, _ = dpsr_loss(
                    (seg, pts.reshape(b * c1, s, 3),
                     pvalid.reshape(b * c1, s)),
                    (yd, targ_pts.reshape(b * c1, -1, 3)), 1.0)
                return l, mut["batch_stats"]

            t = _chained_step_time((v["params"], v["batch_stats"]),
                                   dpsr_loss_fn, reps=2)
            out["train_dpsrnet2_step_ms"] = round(t * 1e3, 2)
            out["train_dpsrnet2_batch"] = b_dpsr
            break
        except Exception as e:  # noqa: BLE001 — halve batch on OOM
            if "RESOURCE_EXHAUSTED" not in str(e) and \
                    b_dpsr <= min(dpsr_batch, B) // 2:
                raise
    return out


def main():
    from fissure_segmentation_tpu.data.synthetic import (
        make_synthetic_image_case, sample_fissure_surface)
    from fissure_segmentation_tpu.keypoints.foerstner import foerstner_keypoints
    from fissure_segmentation_tpu.models import DGCNNSeg, ensemble_predict
    from fissure_segmentation_tpu.models.seg_cnn import (MobileNetASPP,
                                                         predict_full_volume)
    from fissure_segmentation_tpu.postprocess.surface_fitting import (
        fit_fissure_surfaces, mesh_to_labelmap)
    from fissure_segmentation_tpu.utils.coords import kpts_to_grid

    # Wall-clock budget: the axon backend compiles lazily on each program's
    # FIRST execution server-side (~1-4 min per big program, uncacheable from
    # the client — measured 2026-08-20, PERF.md "Methodology"), so a full run
    # is ~15-20 min. To stay robust under external timeouts, diagnostic
    # sections are skipped once the budget would be exceeded — the headline
    # serving rows and the north-star train rows always run and the JSON
    # line always prints. FSEG_BENCH_BUDGET_S=0 disables the guard.
    t_main0 = time.perf_counter()
    budget = float(os.environ.get("FSEG_BENCH_BUDGET_S", "2100"))
    skipped = []

    def over_budget(section: str, est: float, reserve: float) -> bool:
        """True (and records the skip) if running a section estimated at
        `est` seconds would eat into the `reserve` needed by the essential
        sections still ahead (the fused-CNN headline row)."""
        if budget <= 0:
            return False
        if time.perf_counter() - t_main0 + est + reserve > budget:
            skipped.append(section)
            return True
        return False

    # ---- north-star training throughput (f32 + AMP-parity bf16) FIRST,
    # on a fresh device: measured after the serving sections the same
    # chained steps read ~5-6 ms/step slower (84.9-89.0 vs 79.1-87.0
    # standalone, 2026-08-20) — the resident serving buffers change the
    # executable's allocation layout. ----
    train_metrics = bench_train_throughput()
    train_metrics.update(bench_train_throughput(jnp.bfloat16, "_bf16"))
    # opt-in approximate graph build (--knn_recall 0.9: 0.97 measured recall)
    train_metrics.update(bench_train_throughput(
        jnp.bfloat16, "_bf16_knn_recall_0.9", knn_recall=0.9))

    case = make_synthetic_image_case(0, shape=SHAPE)
    img = jnp.asarray(case["image"])
    mask = jnp.asarray(case["lung_mask"])

    model = DGCNNSeg(k=40, in_features=3, num_classes=4, dynamic=False)
    variables = _jit_init(model, jax.random.PRNGKey(0),
                          jnp.zeros((1, 2048, 3), jnp.float32))

    # Untrained bench weights collapse every keypoint into one class, which
    # would starve the surface-fit stage of realistic triangle loads. Add a
    # coordinate-keyed bias AFTER the full DGCNN forward (all FLOPs intact):
    # keypoints in a narrow z-band around each synthetic fissure sheet (on
    # the correct lung side) get that class, so per-class point counts, PSR
    # and marching-tetrahedra loads match a trained model's.
    _zb = []
    _srng = np.random.default_rng(11)
    _scale = np.array(SHAPE[::-1], np.float32) - 1
    for c in (1, 2, 3):
        s = sample_fissure_surface(case["surface_params"], c, 2000, _srng)
        g = np.asarray(kpts_to_grid((s * _scale).astype(np.float32), SHAPE))
        _zb.append((float(g[:, 2].mean()), float(2 * g[:, 2].std() + 0.02),
                    float(np.sign(g[:, 0].mean()))))

    def make_biased_apply(m):
        def biased_apply(variables, x, train=False):
            logits = m.apply(variables, x, train=train)
            z, xg = x[..., 2], x[..., 0]
            for c, (mu, w, side) in enumerate(_zb, start=1):
                band = (jnp.abs(z - mu) < w) & (xg * side > 0)
                logits = logits.at[..., c].add(jnp.where(band, 50.0, 0.0))
            return logits
        return biased_apply

    biased_apply = make_biased_apply(model)

    def ensemble_from_kpts(kpts, valid, rng):
        world = kpts[:, ::-1].astype(jnp.float32)        # zyx -> xyz voxel
        coords = kpts_to_grid(world, SHAPE)              # [-1, 1] grid xyz
        coords = jnp.where(valid[:, None], coords, -1.0)
        probs = ensemble_predict(biased_apply, variables, coords, rng,
                                 sample_points=2048, n_runs_min=50)
        return jnp.argmax(probs, axis=-1)

    def one_case(img, rng):
        kpts, valid, _ = foerstner_keypoints(img, mask, max_kpts=MAX_KPTS)
        return kpts, valid, ensemble_from_kpts(kpts, valid, rng)

    def chained_scalar(case_fn, reps):
        """REPS chained data-dependent cases in one jit -> single scalar."""

        @jax.jit
        def chained(c0):
            def body(c, i):
                _, valid, pred = case_fn(
                    img * (1.0 + 1e-12 * c),
                    jax.random.fold_in(jax.random.PRNGKey(2), i))
                return (jnp.sum(jnp.where(valid, pred, 0)).astype(jnp.float32)
                        * 1e-20), None

            c, _ = jax.lax.scan(body, c0, jnp.arange(reps), length=reps)
            return c

        float(chained(jnp.float32(0)))  # compile + warm up
        return _timeit(lambda: float(chained(jnp.float32(0)))) / reps

    # ---- fused serving path (THE headline): detector -> 50x2048 ensemble
    # -> 3x spectral PSR -> marching tetrahedra in ONE jit, ONE packed
    # ~1.5 MB fetch, then the native host component/labelmap stage
    # (fissure_segmentation_tpu/serving.py). Volume device-resident, as in
    # the chained-scan methodology (upload is not a per-case cost for a
    # device-resident store; over the tunnel it would add ~1.3 s that a
    # colocated host pays in ~20 ms). ----
    from statistics import median

    from fissure_segmentation_tpu.serving import segment_case

    dimg = jax.device_put(img)
    dmask = jax.device_put(mask.astype(bool))

    def time_fused(vol, mode, reps=6, apply=None, approx=False, **kw):
        """Warm + time one serving config; returns (times list, warm res).

        r5 protocol change: rows report the MEDIAN (mins in details). The
        tunnel's per-call sync jitter is ~±50 ms — larger than real config
        differences — so a min over single-digit reps is an unstable
        extreme statistic (r3/r4 fast-vs-exact orderings flipped between
        sessions on exactly this)."""
        def once(seed):
            return segment_case(vol, dmask, apply or biased_apply, variables,
                                jax.random.PRNGKey(seed), kp_mode=mode,
                                center_x=SHAPE[2] / 2, approx_top_k=approx,
                                **kw)

        res = once(0)                          # compile + warm up
        times = []
        for s in range(1, reps + 1):
            t0 = time.perf_counter()
            once(s)
            times.append(time.perf_counter() - t0)
        return times, res

    # warm both the exact and the fast executable BEFORE timing either, then
    # INTERLEAVE their timed repeats so both see the same tunnel conditions
    # (back-to-back blocks confound config with session drift).
    model_fast = DGCNNSeg(k=40, in_features=3, num_classes=4, dynamic=False,
                          dtype=jnp.bfloat16, knn_recall=0.9)
    biased_apply_fast = make_biased_apply(model_fast)

    def once_cfg(fast, seed):
        return segment_case(
            dimg, dmask, biased_apply_fast if fast else biased_apply,
            variables, jax.random.PRNGKey(seed), kp_mode="foerstner",
            center_x=SHAPE[2] / 2, approx_top_k=fast)

    fused_res = once_cfg(False, 0)             # compile + warm exact
    n_fused_tris = [int(v.sum()) for _, v in fused_res.meshes]
    # every foreground class must come out as a real mesh — an empty class
    # means the extraction budget or the class routing broke, and the PSR/MT
    # stage timing would no longer reflect a trained model's load
    assert all(n > 0 for n in n_fused_tris), \
        f"empty fused mesh class: {n_fused_tris}"
    assert fused_res.labelmap.any(), "fused pipeline produced empty labelmap"
    fast_res = once_cfg(True, 0)               # compile + warm fast
    assert fast_res.labelmap.any(), "fast pipeline produced empty labelmap"

    t_exact, t_fast = [], []
    for s in range(1, 9):
        t0 = time.perf_counter()
        once_cfg(False, s)
        t_exact.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        once_cfg(True, s)
        t_fast.append(time.perf_counter() - t0)
    fused_case_seconds = median(t_exact)
    fused_fast_seconds = median(t_fast)

    hessian_times, _ = time_fused(dimg, "enhancement")
    fused_hessian_seconds = median(hessian_times)

    # throughput-pipelined batch serving (serving.segment_cases): case i's
    # packed fetch + native host filter overlap case i+1's device dispatch,
    # so batch throughput approaches 1/max(device, tail) instead of
    # 1/(device+tail) — same executable as the exact row above. r5 protocol:
    # a warm-up batch first (the r4 driver's single COLD shot measured the
    # one-time eager-key compile + a tunnel stall as "2.11 s/case"), then
    # min over timed batches, with per-case dispatch/finish instrumentation
    # recorded so a recurrence is diagnosable from the artifact itself.
    from fissure_segmentation_tpu.serving import segment_cases
    NPIPE = 8
    segment_cases([dimg] * 2, [dmask] * 2, biased_apply, variables,
                  jax.random.PRNGKey(2), center_x=SHAPE[2] / 2)
    batch_means, case_tms = [], []
    for rep in range(2):
        tm: list = []
        t0 = time.perf_counter()
        pipe_res = segment_cases([dimg] * NPIPE, [dmask] * NPIPE,
                                 biased_apply, variables,
                                 jax.random.PRNGKey(3 + rep),
                                 center_x=SHAPE[2] / 2, timings=tm)
        batch_means.append((time.perf_counter() - t0) / NPIPE)
        case_tms += tm
        assert all(r.labelmap.any() for r in pipe_res)
    pipe_s = min(batch_means)
    train_metrics["serving_pipelined_s_per_case"] = round(pipe_s, 4)
    train_metrics["serving_pipelined_cases_per_sec"] = round(1 / pipe_s, 2)
    train_metrics["serving_pipelined_batch_means"] = [
        round(b, 4) for b in batch_means]
    # per-case stage medians: threaded mode reports fetch_s/host_s, the
    # single-threaded fallback finish_s
    for key in ("dispatch_s", "fetch_s", "host_s", "finish_s"):
        vals = [t[key] for t in case_tms if key in t]
        if vals:
            train_metrics[f"pipelined_{key[:-2]}_ms_median"] = round(
                1e3 * median(vals), 1)

    # fast-variant batch serving: the same 3-stage pipeline on the
    # bf16/knn_recall model + approx detector (executable already compiled
    # by the interleaved serving rows above, so this costs only the runs)
    segment_cases([dimg] * 2, [dmask] * 2, biased_apply_fast, variables,
                  jax.random.PRNGKey(5), center_x=SHAPE[2] / 2,
                  approx_top_k=True)
    fast_means = []
    for rep in range(2):
        t0 = time.perf_counter()
        pipe_res = segment_cases([dimg] * NPIPE, [dmask] * NPIPE,
                                 biased_apply_fast, variables,
                                 jax.random.PRNGKey(6 + rep),
                                 center_x=SHAPE[2] / 2, approx_top_k=True)
        fast_means.append((time.perf_counter() - t0) / NPIPE)
        assert all(r.labelmap.any() for r in pipe_res)
    train_metrics["serving_pipelined_fast_s_per_case"] = round(
        min(fast_means), 4)
    train_metrics["serving_pipelined_fast_cases_per_sec"] = round(
        1 / min(fast_means), 2)
    train_metrics["serving_exact_min_s"] = round(min(t_exact), 4)
    train_metrics["fused_fast_min_s"] = round(min(t_fast), 4)
    train_metrics["hessian_min_s"] = round(min(hessian_times), 4)

    # one train-step row per additional trainable family (DPSRNet2 /
    # DG-SSM / PC-AE) — evidence beyond the flagship; measured before the
    # skippable diagnostics so a slow compile server drops those first
    if not over_budget("family_train_steps", 300, 400):
        train_metrics.update(bench_family_steps())

    REPS = 5

    # ---- exact vs approx_max_k keypoint extraction (detector only):
    # decides whether the 16.7M-element top-k dominates the Foerstner stage
    # and whether the approx flag should become the default ----
    def foerstner_only(approx):
        def fn(img, rng):
            kpts, valid, _ = foerstner_keypoints(img, mask,
                                                 max_kpts=MAX_KPTS,
                                                 approx_top_k=approx)
            return kpts, valid, jnp.where(valid, kpts[:, 0], 0)
        return fn

    # essential work still ahead of each optional section (train benches
    # ~500 s + the fused-CNN headline row ~150 s), for the budget guard
    if over_budget("foerstner_detector_stages", 180, 200):
        foerstner_exact_seconds = foerstner_approx_seconds = None
    else:
        foerstner_exact_seconds = chained_scalar(foerstner_only(False), REPS)
        foerstner_approx_seconds = chained_scalar(foerstner_only(True), REPS)

    # ---- staged keypoints+prediction for the PC-AE pipeline and the
    # representative stage-B point sets below ----
    do_staged = not over_budget("staged_pcae_and_stage_b", 420, 200)
    if do_staged:
        fetch = jax.jit(one_case)
        kpts, valid, pred = (np.asarray(a)
                             for a in fetch(img, jax.random.PRNGKey(2)))

    # ---- CNN-keypoint pipeline: sliding-window pre-seg CNN (host loop of
    # jitted 128^3 patches, Gaussian blending) + fg keypoints + softmax-
    # patch features + the same ensemble ----
    cnn = MobileNetASPP(num_classes=4)
    cnn_vars = _jit_init(cnn, jax.random.PRNGKey(5),
                         jnp.zeros((1, 128, 128, 128, 1), jnp.float32))

    def cnn_softmax():
        # whole-volume single-pass forward (models/seg_cnn.py:
        # predict_full_volume) — the TPU-native replacement for the
        # reference's 27-patch 50%-overlap sliding window (seg_cnn.py:22-62):
        # one chip's HBM fits the full 256^3 activation footprint in bf16,
        # so the ~3.4x redundant tiling compute disappears.
        soft = predict_full_volume(cnn.apply, cnn_vars, img,
                                   dtype=jnp.bfloat16)
        # force completion: fetch a scalar that depends on the output
        float(jnp.sum(soft[0, 0, 0]))
        return soft

    if over_budget("cnn_staged_stages", 300, 200):
        cnn_window_seconds = cnn_tail_seconds = None
    else:
        soft = cnn_softmax()                   # warm-up (compiles fwd)
        cnn_window_seconds = _timeit(cnn_softmax, repeats=2)

        # staged tail: cnn keypoints -> ensemble -> PSR -> MT on a
        # precomputed softmax volume (the two-dispatch protocol; kept as a
        # stage diagnostic)
        cnn_tail_times, _ = time_fused(soft, "cnn", reps=2)
        cnn_tail_seconds = median(cnn_tail_times)

    # FULLY fused CNN pipeline: MobileNetASPP full-volume forward + cnn
    # keypoints + ensemble + PSR + MT in ONE dispatch on the raw CT
    # (serving.segment_case(cnn_apply_fn=...)) — no softmax volume ever
    # leaves the executable. The pipeline's point ensemble runs in bf16 with
    # EXACT kNN graphs (consistent with the bf16 pre-seg CNN itself; the
    # bf16-vs-f32 accuracy deltas are below resolution, README
    # "Exact-vs-fast"), and the random foreground subsample uses
    # approx_top_k — distribution-preserving for RANDOM scores (see
    # keypoints/extraction.py:get_cnn_keypoints), unlike the Förstner
    # detector where approx trades recall of meaningful scores.
    model_bf16 = DGCNNSeg(k=40, in_features=3, num_classes=4, dynamic=False,
                          dtype=jnp.bfloat16)
    cnn_fused_times, cnn_res = time_fused(
        dimg, "cnn", apply=make_biased_apply(model_bf16), approx=True,
        cnn_apply_fn=cnn.apply, cnn_variables=cnn_vars,
        cnn_dtype=jnp.bfloat16)
    cnn_fused_seconds = median(cnn_fused_times)
    train_metrics["cnn_min_s"] = round(min(cnn_fused_times), 4)
    assert cnn_res.labelmap.any(), "cnn fused pipeline: empty labelmap"

    # ---- DGCNN+PC-AE pipeline (reference: 0.418 s/case,
    # performance_time_plot.py:34): same Foerstner keypoints + ensemble,
    # then per-class masked FPS -> folding-net mesh decode instead of the
    # PSR surface fit — the whole case is ONE jit (mesh verts come out
    # directly; no labelmap stage in the reference's PC-AE runtime). ----
    pcae_case_seconds = stage_b_seconds = None
    if do_staged:
        from fissure_segmentation_tpu.models.folding_net import DGCNNFoldingNet
        from fissure_segmentation_tpu.ops.fps import farthest_point_sampling

        ae = DGCNNFoldingNet(k=20, n_embedding=512, shape_type="plane",
                             n_input_points=1024, decode_mesh=True)
        ae_vars = _jit_init(ae, jax.random.PRNGKey(7),
                            jnp.zeros((1, 1024, 3), jnp.float32))

        def one_case_pcae(img, rng):
            kpts, valid, pred = one_case(img, rng)
            world = kpts[:, ::-1].astype(jnp.float32)
            coords = kpts_to_grid(world, SHAPE)[None]
            verts_all = []
            for c in (1, 2, 3):
                m = (valid & (pred == c))[None]
                idx = farthest_point_sampling(coords, 1024, mask=m)
                sub = jnp.take_along_axis(coords, idx[..., None], axis=1)
                verts, _ = ae.apply(ae_vars, sub, train=False)
                verts_all.append(verts)
            return jnp.concatenate(verts_all, axis=1)

        @jax.jit
        def pcae_chain(c0):
            def body(c, i):
                verts = one_case_pcae(
                    img * (1.0 + 1e-12 * c),
                    jax.random.fold_in(jax.random.PRNGKey(4), i))
                return jnp.sum(verts).astype(jnp.float32) * 1e-20, None

            c, _ = jax.lax.scan(body, c0, jnp.arange(3), length=3)
            return c

        float(pcae_chain(jnp.float32(0)))  # compile + warm up
        pcae_stage_seconds = _timeit(
            lambda: float(pcae_chain(jnp.float32(0)))) / 3
        # mesh fetch: 3x (1, 2025, 3) verts ~73 kB, via the scalar chain
        pcae_case_seconds = pcae_stage_seconds

        # ---- stage B: per-fissure mesh fit + labelmap (host wall) ----
        # All 3 classes fit in ONE vmapped device dispatch
        # (fit_fissure_surfaces); untrained bench weights may starve a
        # class, so classes with <100 predicted points are substituted by
        # representatively-sized GT surface samples (runtime depends on
        # point counts, not values).
        scale = np.array(SHAPE[::-1], np.float32) - 1  # [0,1]^3 -> voxel
        gt_rng = np.random.default_rng(3)
        world = kpts[:, ::-1].astype(np.float32)

        pts_list = []
        for c in (1, 2, 3):
            pts = world[valid & (pred == c)]
            if len(pts) < 100:
                pts = sample_fissure_surface(
                    case["surface_params"], c, 6000,
                    gt_rng).astype(np.float32) * scale
            pts_list.append(pts)
        n_total = sum(len(p) for p in pts_list)
        all_pts = np.concatenate(pts_list)
        class_valid = np.zeros((3, n_total), bool)
        off = 0
        for i, p in enumerate(pts_list):
            class_valid[i, off:off + len(p)] = True
            off += len(p)

        def stage_b():
            meshes = fit_fissure_surfaces(
                all_pts, class_valid, SHAPE, grid_res=(64, 64, 64),
                max_tris=24000, rights=[False, True, True],
                center_x=SHAPE[2] / 2)
            return mesh_to_labelmap(meshes, SHAPE)

        stage_b()  # warm up (compiles the PSR + marching-tetrahedra jits)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            labelmap = stage_b()
            times.append(time.perf_counter() - t0)
        stage_b_seconds = min(times)
        assert labelmap.any(), "pipeline produced an empty labelmap"

    case_seconds = fused_case_seconds
    hessian_case_seconds = fused_hessian_seconds
    cnn_case_seconds = cnn_fused_seconds

    def rnd(x, n=4):
        return None if x is None else round(x, n)

    details = {
        **train_metrics,
        "fused_fast_s_per_case": round(fused_fast_seconds, 4),
        "fused_fast_vs_baseline": round(
            REFERENCE_CASE_SECONDS / fused_fast_seconds, 3),
        "hessian_pipeline_s_per_case": round(hessian_case_seconds, 4),
        "hessian_vs_baseline": round(
            REFERENCE_HESSIAN_SECONDS / hessian_case_seconds, 1),
        "cnn_pipeline_s_per_case": round(cnn_case_seconds, 4),
        "cnn_vs_baseline": round(
            REFERENCE_CNN_SECONDS / cnn_case_seconds, 2),
        "pcae_pipeline_s_per_case": rnd(pcae_case_seconds),
        "pcae_vs_baseline": (
            None if pcae_case_seconds is None
            else round(REFERENCE_PCAE_SECONDS / pcae_case_seconds, 2)),
        "fused_mesh_triangles": n_fused_tris,
        "stage_seconds": {
            "foerstner_detector_exact_topk": rnd(foerstner_exact_seconds),
            "foerstner_detector_approx_topk": rnd(foerstner_approx_seconds),
            "cnn_full_volume_fwd": rnd(cnn_window_seconds),
            "cnn_staged_tail": rnd(cnn_tail_seconds),
            "staged_surface_fit_plus_labelmap": rnd(stage_b_seconds),
        },
    }
    details["stage_seconds"] = {k: v for k, v
                                in details["stage_seconds"].items()
                                if v is not None}
    details = {k: v for k, v in details.items() if v is not None}
    if skipped:
        details["skipped_over_budget"] = skipped
    print(json.dumps({
        "metric": "full-case serving latency (Foerstner keypoints on 256^3 CT"
                  " -> 50x2048-subset DGCNN ensemble -> 3x spectral-PSR mesh"
                  " fit + labelmap; ONE fused dispatch + packed fetch, 1 chip;"
                  " median of 8 warm repeats, exact/fast interleaved)",
        "value": round(case_seconds, 4),
        "unit": "s/case",
        "vs_baseline": round(REFERENCE_CASE_SECONDS / case_seconds, 3),
        "details": details,
    }))


def _probe_backend(timeout_s: int = 300):
    """Fail fast if the device backend is unreachable.

    The axon TPU tunnel can go down and then the first device touch blocks
    FOREVER in uninterruptible iowait (no error, and SIGALRM never fires
    because the hang is inside backend init in C). Probe in a subprocess
    bounded by a hard timeout so a dead tunnel yields a clear error instead
    of a silent hang."""
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; "
            "jnp.ones((8, 8)).sum().block_until_ready(); print('ok')")
    # NOT subprocess.run(timeout=...): on expiry it kill()s then wait()s, and
    # a child stuck in uninterruptible D-state iowait never dies, so wait()
    # would hang forever. Poll a deadline and abandon the corpse instead.
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.PIPE)
    deadline = time.monotonic() + timeout_s
    while proc.poll() is None:
        if time.monotonic() > deadline:
            proc.kill()  # best effort; do NOT wait on it
            raise TimeoutError(
                f"device backend unreachable after {timeout_s}s "
                "(TPU tunnel down?) — bench aborted")
        time.sleep(1.0)
    if proc.returncode != 0:
        raise RuntimeError("device backend probe failed:\n"
                           + proc.stderr.read().decode(errors="replace")[-2000:])


if __name__ == "__main__":
    _probe_backend()
    main()
