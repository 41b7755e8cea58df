"""Decompose the DGCNN train step (B=32,N=2048,k=40, bf16) into stages."""
import time, functools
import jax, jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fissure_segmentation_tpu.losses.segmentation import nnu_loss
from fissure_segmentation_tpu.models import DGCNNSeg
from fissure_segmentation_tpu.ops import knn

B, N, K, REPS = 32, 2048, 40, 8
x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
y = jax.random.randint(jax.random.PRNGKey(1), (B, N), 0, 4)
model = DGCNNSeg(k=K, in_features=3, num_classes=4, dynamic=False,
                 dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(2), x, train=False)
tx = optax.adam(1e-3)
opt_state = tx.init(variables["params"])


def chain_scalar(fn, *args, reps=REPS):
    """Chain `reps` data-dependent evaluations of fn inside one jit, return
    per-iteration seconds."""
    @jax.jit
    def chained(*a):
        def body(carry, i):
            out = fn(*a, carry, i)
            return out, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps, dtype=jnp.float32))
        return c
    float(chained(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


# 1. kNN graph only
def knn_only(x, carry, i):
    idx = knn(x * (1.0 + 1e-12 * (i + carry)), K, self_loop=False)
    return carry + jnp.float32(idx[0, 0, 0])

t = chain_scalar(knn_only, x)
print(f"knn graph:            {t*1e3:8.2f} ms")

# 2. forward only (train mode)
def fwd_only(params, bs, x, carry, i):
    logits, mut = model.apply({"params": params, "batch_stats": bs},
                              x * (1.0 + 1e-12 * (i + carry)), train=True,
                              mutable=["batch_stats"])
    return carry + logits[0, 0, 0]

t = chain_scalar(fwd_only, variables["params"], variables["batch_stats"], x)
print(f"forward (train):      {t*1e3:8.2f} ms")

# 2b. forward eval mode (no batch stats)
def fwd_eval(params, bs, x, carry, i):
    logits = model.apply({"params": params, "batch_stats": bs},
                         x * (1.0 + 1e-12 * (i + carry)), train=False)
    return carry + logits[0, 0, 0]

t = chain_scalar(fwd_eval, variables["params"], variables["batch_stats"], x)
print(f"forward (eval):       {t*1e3:8.2f} ms")

# 3. loss + grad (no optimizer)
def grad_only(params, bs, x, y, carry, i):
    def loss(p):
        logits, mut = model.apply({"params": p, "batch_stats": bs},
                                  x * (1.0 + 1e-12 * (i + carry)), train=True,
                                  mutable=["batch_stats"])
        l, _ = nnu_loss(logits, y)
        return l
    l, g = jax.value_and_grad(loss)(params)
    return carry + l + jnp.float32(jax.tree_util.tree_leaves(g)[0].reshape(-1)[0])

t = chain_scalar(grad_only, variables["params"], variables["batch_stats"], x, y)
print(f"fwd+bwd (no opt):     {t*1e3:8.2f} ms")

# 4. full step
def full_step(params, bs, opt, x, y, carry, i):
    def loss(p):
        logits, mut = model.apply({"params": p, "batch_stats": bs},
                                  x * (1.0 + 1e-12 * (i + carry)), train=True,
                                  mutable=["batch_stats"])
        l, _ = nnu_loss(logits, y)
        return l, mut["batch_stats"]
    (l, nbs), g = jax.value_and_grad(loss, has_aux=True)(params)
    upd, opt2 = tx.update(g, opt, params)
    p2 = optax.apply_updates(params, upd)
    return carry + l + jnp.float32(jax.tree_util.tree_leaves(p2)[0].reshape(-1)[0])

t = chain_scalar(full_step, variables["params"], variables["batch_stats"],
                 opt_state, x, y)
print(f"full step:            {t*1e3:8.2f} ms")

# 5. loss only on fixed logits (nnu_loss cost)
logits0 = jnp.zeros((B, N, 4), jnp.float32)
def loss_only(logits, y, carry, i):
    l, _ = nnu_loss(logits * (1.0 + 1e-12 * (i + carry)), y)
    return carry + l

t = chain_scalar(loss_only, logits0, y)
print(f"nnu_loss fwd:         {t*1e3:8.2f} ms")
