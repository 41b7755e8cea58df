"""Round-3 step decomposition: where do the 85.3 ms bf16 really go?

Round 2's standalone op numbers (scatter 12.9 ms, kNN 24.8 ms) turned out
to be inflated by the harness's own 640 MB data-dependence add-pass
(prof_scatter_clean.py: true mm2 time 4.7 ms). This script ablates the
REAL train step: kNN alone, forward alone, fwd+bwd, full step — all with
the bench.py chained-scan (perturbation only on the tiny (B,N,3) input).
"""
import time

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fissure_segmentation_tpu.losses.segmentation import nnu_loss
from fissure_segmentation_tpu.models import DGCNNSeg
from fissure_segmentation_tpu.ops import knn

B, N, K, REPS = 32, 2048, 40, 8
DT = jnp.bfloat16


def timeit(fn):
    fn()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS


def chain(body_fn, *args):
    @jax.jit
    def ch(*a):
        def body(c, i):
            return body_fn(c, i, *a), ()
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(REPS, dtype=jnp.float32))
        return c
    return lambda: float(ch(*args))


model = DGCNNSeg(k=K, in_features=3, num_classes=4, dynamic=False, dtype=DT)
x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
y = jax.random.randint(jax.random.PRNGKey(1), (B, N), 0, 4)
variables = model.init(jax.random.PRNGKey(2), x, train=False)
tx = optax.adam(1e-3)
opt_state = tx.init(variables["params"])
params, bs = variables["params"], variables["batch_stats"]


def b_knn(c, i, x):
    idx = knn(x * (1 + 1e-12 * (i + c)), K)
    return c + idx[0, 0, 0].astype(jnp.float32) * 1e-20


def b_fwd(c, i, params, bs, x):
    logits, _ = model.apply({"params": params, "batch_stats": bs},
                            x * (1 + 1e-12 * (i + c)), train=True,
                            mutable=["batch_stats"])
    return c + logits[0, 0, 0].astype(jnp.float32) * 1e-20


def b_fwdbwd(c, i, params, bs, x):
    def loss(p):
        logits, mut = model.apply({"params": p, "batch_stats": bs},
                                  x * (1 + 1e-12 * (i + c)), train=True,
                                  mutable=["batch_stats"])
        l, _ = nnu_loss(logits, y)
        return l
    l, g = jax.value_and_grad(loss)(params)
    leaf = jax.tree_util.tree_leaves(g)[0]
    return c + l * 0 + leaf.ravel()[0].astype(jnp.float32) * 1e-20


print(f"kNN graph (B={B} N={N} k={K})   "
      f"{timeit(chain(b_knn, x))*1e3:7.2f} ms")
print(f"forward only (train=True)       "
      f"{timeit(chain(b_fwd, params, bs, x))*1e3:7.2f} ms")
print(f"forward+backward                "
      f"{timeit(chain(b_fwdbwd, params, bs, x))*1e3:7.2f} ms")

# full step (bench.py replica)
@jax.jit
def full(params, bs, opt_state, x, y):
    def body(carry, i):
        params, bs, opt = carry

        def loss(p):
            logits, mut = model.apply({"params": p, "batch_stats": bs},
                                      x * (1.0 + 1e-12 * i), train=True,
                                      mutable=["batch_stats"])
            l, _ = nnu_loss(logits, y)
            return l, mut["batch_stats"]

        (l, nbs), g = jax.value_and_grad(loss, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return (optax.apply_updates(params, upd), nbs, opt), l

    (params, bs, opt), ls = jax.lax.scan(
        body, (params, bs, opt_state), jnp.arange(REPS, dtype=jnp.float32))
    return ls[-1]


print(f"full step (fwd+bwd+adam)        "
      f"{timeit(lambda: float(full(params, bs, opt_state, x, y)))*1e3:7.2f} ms")
