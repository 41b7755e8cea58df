"""Benchmark: end-to-end fissure segmentation of one full CT keypoint cloud.

Measures the reference's serving protocol (models/point_seg_net.py:21-48) on
one chip: a full ~20k-point cloud is segmented by ensembling 50 random
2048-point subsets through the canonical DGCNN (k=40, static graph) and
argmax-decoded. As more pipeline stages land (device keypoint extraction,
Poisson surface fitting), they are added to this benchmark so the number
stays comparable to the reference's published per-case runtime.

Baseline: 1.352 s/case total runtime for DGCNN (Förstner keypoints) on the
reference's GPU node (performance_time_plot.py:31; BASELINE.md).
vs_baseline > 1 means faster than the reference.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp

REFERENCE_CASE_SECONDS = 1.352  # performance_time_plot.py:31


def main():
    from fissure_segmentation_tpu.data import make_synthetic_case
    from fissure_segmentation_tpu.models import DGCNNSeg, ensemble_predict

    case = make_synthetic_case(0, n_points=20000, with_feature=True)
    pc = jnp.concatenate([jnp.asarray(case["coords"]),
                          jnp.asarray(case["features"])], axis=1)

    model = DGCNNSeg(k=40, in_features=4, num_classes=4, dynamic=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2048, 4), jnp.float32), train=False)

    # Timing methodology: on remote-attached TPUs (axon tunnel)
    # block_until_ready can be a no-op and fetching a full array measures
    # the tunnel, not the chip. So: chain REPS data-dependent end-to-end
    # cases inside ONE jit via lax.scan and fetch a single scalar — the
    # wall time divided by REPS is pure device time per case.
    REPS = 5

    @jax.jit
    def chained(c0):
        def body(c, i):
            probs = ensemble_predict(
                model.apply, variables, pc * (1.0 + 1e-12 * c),
                jax.random.fold_in(jax.random.PRNGKey(2), i),
                sample_points=2048, n_runs_min=50)
            pred = jnp.argmax(probs, axis=-1)
            return jnp.sum(pred).astype(jnp.float32) * 1e-20, None
        c, _ = jax.lax.scan(body, c0, jnp.arange(REPS), length=REPS)
        return c

    float(chained(jnp.float32(0)))  # compile + warm up
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(jnp.float32(0)))
        times.append(time.perf_counter() - t0)
    case_seconds = min(times) / REPS

    print(json.dumps({
        "metric": "end-to-end full-cloud fissure segmentation latency "
                  "(50x2048-subset DGCNN ensemble, 20k-pt case, 1 chip)",
        "value": round(case_seconds, 4),
        "unit": "s/case",
        "vs_baseline": round(REFERENCE_CASE_SECONDS / case_seconds, 3),
    }))


if __name__ == "__main__":
    main()
