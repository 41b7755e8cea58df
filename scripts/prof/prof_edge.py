"""Granular EdgeConv timing: isolate gather / BN / max / backward costs."""
import time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fissure_segmentation_tpu.ops.edge import edge_mlp_pre_gather, gather_neighbors

B, N, K, C, F = 32, 2048, 40, 64, 64
REPS = 8


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


k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
x = jax.random.normal(k2, (B, N, C), jnp.bfloat16)
idx = jax.random.randint(k1, (B, N, K), 0, N)
w = jax.random.normal(k3, (2 * C, F), jnp.bfloat16) * 0.05
gamma = jnp.ones((F,), jnp.float32)
beta = jnp.zeros((F,), jnp.float32)


def bn_train(z, gamma, beta):
    # train-mode batch norm over all edge axes, f32 stats like flax
    zf = z.astype(jnp.float32)
    mu = zf.mean(axis=(0, 1, 2))
    var = zf.var(axis=(0, 1, 2))
    out = (zf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
    return out.astype(z.dtype)


def perturb(x, carry, i):
    return x * (1 + 1e-12 * (i + carry)).astype(x.dtype)


# --- forward variants ---
def f_gather_max(x, idx, w, carry, i):
    z = edge_mlp_pre_gather(perturb(x, carry, i), idx, w)
    return carry + jnp.max(z, axis=-2).astype(jnp.float32)[0, 0, 0]

def f_gather_bn_relu_max(x, idx, w, carry, i):
    z = edge_mlp_pre_gather(perturb(x, carry, i), idx, w)
    z = bn_train(z, gamma, beta)
    z = jax.nn.leaky_relu(z, 0.2)
    return carry + jnp.max(z, axis=-2).astype(jnp.float32)[0, 0, 0]

def f_two_layer(x, idx, w, carry, i):
    # EdgeConv([64,64]): EdgeMLP -> SharedMLP over edges -> max
    z = edge_mlp_pre_gather(perturb(x, carry, i), idx, w)
    z = bn_train(z, gamma, beta)
    z = jax.nn.leaky_relu(z, 0.2)
    z = z @ w[:F]
    z = bn_train(z, gamma, beta)
    z = jax.nn.leaky_relu(z, 0.2)
    return carry + jnp.max(z, axis=-2).astype(jnp.float32)[0, 0, 0]


for name, fn in [("gather+max fwd", f_gather_max),
                 ("gather+BN+relu+max fwd", f_gather_bn_relu_max),
                 ("two-layer EdgeConv fwd", f_two_layer)]:
    t = chain_scalar(fn, x, idx, w)
    print(f"{name:34s}{t*1e3:8.2f} ms")

# --- fwd+bwd variants ---
def g(fn_core):
    def wrapped(x, idx, w, carry, i):
        def f(x, w):
            return fn_core(perturb(x, carry, i), idx, w)
        l, (dx, dw) = jax.value_and_grad(f, argnums=(0, 1))(x, w)
        return carry + l * 1e-6 + dx[0, 0, 0].astype(jnp.float32)
    return wrapped

def c_gather_max(x, idx, w):
    z = edge_mlp_pre_gather(x, idx, w)
    return jnp.max(z, axis=-2).astype(jnp.float32).sum()

def c_bn(x, idx, w):
    z = edge_mlp_pre_gather(x, idx, w)
    z = bn_train(z, gamma, beta)
    z = jax.nn.leaky_relu(z, 0.2)
    return jnp.max(z, axis=-2).astype(jnp.float32).sum()

def c_two(x, idx, w):
    z = edge_mlp_pre_gather(x, idx, w)
    z = bn_train(z, gamma, beta)
    z = jax.nn.leaky_relu(z, 0.2)
    z = z @ w[:F]
    z = bn_train(z, gamma, beta)
    z = jax.nn.leaky_relu(z, 0.2)
    return jnp.max(z, axis=-2).astype(jnp.float32).sum()

for name, fn in [("gather+max fwd+bwd", c_gather_max),
                 ("gather+BN+relu+max fwd+bwd", c_bn),
                 ("two-layer EdgeConv fwd+bwd", c_two)]:
    t = chain_scalar(g(fn), x, idx, w)
    print(f"{name:34s}{t*1e3:8.2f} ms")
