"""Fused vs unfused single-layer EdgeConv on the real chip.

Measures (bench.py chained-scan methodology, carry injected through the
tiny (B, N, 3) input):
  1. the full DGCNN seg train step (B=32, N=2048, k=40, NNU+Adam) with
     FSEG_FUSED_EDGE on/off, f32 and bf16;
  2. the standalone fused kernel pieces (scatter_add_routed, scatter_count)
     at the canonical config;
  3. eval-mode ensemble forward (the serving hot path) fused vs unfused.

Run: PYTHONPATH=. python scripts/prof/prof_fused_edge.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, N, K, C, REPS = 32, 2048, 40, 64, 8


def timeit(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS


def train_step_time(dtype, fused):
    os.environ["FSEG_FUSED_EDGE"] = "1" if fused else "0"
    from fissure_segmentation_tpu.losses.segmentation import nnu_loss
    from fissure_segmentation_tpu.models import DGCNNSeg

    model = DGCNNSeg(k=K, in_features=3, num_classes=4, dynamic=False,
                     dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
    y = jax.random.randint(jax.random.PRNGKey(1), (B, N), 0, 4)
    variables = model.init(jax.random.PRNGKey(2), x, train=False)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def chain(params, bs, opt_state, x, y):
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
            body, (params, bs, opt_state),
            jnp.arange(REPS, dtype=jnp.float32))
        return ls[-1]

    args = (variables["params"], variables["batch_stats"], opt_state, x, y)
    return timeit(lambda: float(chain(*args))) * 1e3


def eval_fwd_time(dtype, fused):
    os.environ["FSEG_FUSED_EDGE"] = "1" if fused else "0"
    from fissure_segmentation_tpu.models import DGCNNSeg

    model = DGCNNSeg(k=K, in_features=3, num_classes=4, dynamic=False,
                     dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x, train=False)

    @jax.jit
    def chain(variables, x):
        def body(c, i):
            logits = model.apply(variables, x * (1.0 + 1e-12 * (i + c)),
                                 train=False)
            return c + logits[0, 0, 0].astype(jnp.float32) * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(REPS, dtype=jnp.float32))
        return c

    return timeit(lambda: float(chain(variables, x))) * 1e3


def kernel_times():
    from fissure_segmentation_tpu.ops.pallas.scatter import (
        scatter_add_routed, scatter_count)

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
    ks = jnp.asarray(rng.integers(0, K, (B, N, C)), jnp.int32)
    s = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
    p = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)

    @jax.jit
    def ch_routed(s0):
        def body(c, i):
            o = scatter_add_routed(idx, ks, s * (1 + 1e-12 * (i + c)), p, N)
            return c + o[0, 0, 0] * 1e-20, ()
        c, _ = jax.lax.scan(body, s0, jnp.arange(REPS, dtype=jnp.float32))
        return c

    @jax.jit
    def ch_count(s0):
        def body(c, i):
            o = scatter_count((idx + (i + c).astype(jnp.int32) * 0
                               ).reshape(B, N * K), N)
            return c + o[0, 0] * 1e-20, ()
        c, _ = jax.lax.scan(body, s0, jnp.arange(REPS, dtype=jnp.float32))
        return c

    t_r = timeit(lambda: float(ch_routed(jnp.float32(0)))) * 1e3
    t_c = timeit(lambda: float(ch_count(jnp.float32(0)))) * 1e3
    print(f"scatter_add_routed (bf16, 2C out) {t_r:6.2f} ms | "
          f"scatter_count {t_c:6.2f} ms", flush=True)


if __name__ == "__main__":
    kernel_times()
    for dtype, tag in ((jnp.bfloat16, "bf16"), (None, "f32")):
        tu = train_step_time(dtype, False)
        tf = train_step_time(dtype, True)
        print(f"train step {tag}: unfused {tu:6.1f} ms | fused {tf:6.1f} ms",
              flush=True)
        eu = eval_fwd_time(dtype, False)
        ef = eval_fwd_time(dtype, True)
        print(f"eval fwd   {tag}: unfused {eu:6.1f} ms | fused {ef:6.1f} ms",
              flush=True)
