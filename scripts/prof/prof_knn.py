"""kNN graph build variants at the canonical config (B=32, N=2048, k=40)."""
import time
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fissure_segmentation_tpu.ops import knn

B, N, K, REPS = 32, 2048, 40, 8
x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)


def chain_scalar(fn, *args, reps=REPS):
    @jax.jit
    def chained(*a):
        def body(carry, i):
            return fn(*a, carry, i), ()
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(reps, dtype=jnp.float32))
        return c
    float(chained(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


def mk(**kw):
    def f(x, carry, i):
        idx = knn(x * (1.0 + 1e-12 * (i + carry)), K, self_loop=False, **kw)
        return carry + jnp.float32(idx[0, 0, 0])
    return f


t = chain_scalar(mk(), x)
print(f"exact pallas:            {t*1e3:8.2f} ms")
for rt in (0.9,):
    t = chain_scalar(mk(recall_target=rt), x)
    print(f"approx recall={rt}:      {t*1e3:8.2f} ms")

# measured recall of the approx path vs exact, on-chip
exact = np.asarray(knn(x, K, self_loop=False))
for rt in (0.9,):
    ap = np.asarray(knn(x, K, self_loop=False, recall_target=rt))
    hits = 0
    for b in range(4):
        for n in range(N):
            hits += len(set(exact[b, n]) & set(ap[b, n]))
    print(f"measured recall @ {rt}: {hits / (4 * N * K):.4f}")

# full train step with approx graphs
import optax
from fissure_segmentation_tpu.losses.segmentation import nnu_loss
from fissure_segmentation_tpu.models import DGCNNSeg

y = jax.random.randint(jax.random.PRNGKey(1), (B, N), 0, 4)
for rt in (0.9,):
    model = DGCNNSeg(k=K, in_features=3, num_classes=4, dynamic=False,
                     dtype=jnp.bfloat16, knn_recall=rt)
    variables = model.init(jax.random.PRNGKey(2), x, train=False)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    def full_step(params, bs, opt, x, y, carry, i):
        def loss(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": bs},
                x * (1.0 + 1e-12 * (i + carry)), train=True,
                mutable=["batch_stats"])
            l, _ = nnu_loss(logits, y)
            return l, mut["batch_stats"]
        (l, nbs), g = jax.value_and_grad(loss, has_aux=True)(params)
        upd, opt2 = tx.update(g, opt, params)
        p2 = optax.apply_updates(params, upd)
        return carry + l + jnp.float32(
            jax.tree_util.tree_leaves(p2)[0].reshape(-1)[0])

    t = chain_scalar(full_step, variables["params"], variables["batch_stats"],
                     opt_state, x, y)
    print(f"full step knn_recall={rt}: {t*1e3:8.2f} ms "
          f"({B/t:.0f} clouds/s)")
