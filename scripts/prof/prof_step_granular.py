"""Granular timing: scatter_add_mm, gather fwd, single EdgeConv fwd/bwd."""
import time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fissure_segmentation_tpu.ops.pallas.scatter import scatter_add_mm
from fissure_segmentation_tpu.ops.edge import gather_neighbors, edge_mlp_pre_gather

B, N, K, C = 32, 2048, 40, 64
E = N * (K + 1)
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
idx = jax.random.randint(k1, (B, E), 0, N)
g_bf16 = jax.random.normal(k2, (B, E, C), jnp.bfloat16)
g_f32 = g_bf16.astype(jnp.float32)
x_bf16 = jax.random.normal(k3, (B, N, C), jnp.bfloat16)
idx_nk = idx.reshape(B, N, K + 1)[..., 1:]

def s_bf16(idx, g, carry, i):
    out = scatter_add_mm(idx, g * (1 + 1e-12 * (i + carry)).astype(g.dtype), N)
    return carry + out[0, 0, 0].astype(jnp.float32)

t = chain_scalar(s_bf16, idx, g_bf16)
print(f"scatter_add_mm bf16 (E={E}):  {t*1e3:8.2f} ms")
t = chain_scalar(s_bf16, idx, g_f32)
print(f"scatter_add_mm f32  (E={E}):  {t*1e3:8.2f} ms")

def gth(x, idx, carry, i):
    out = gather_neighbors(x * (1 + 1e-12 * (i + carry)).astype(x.dtype), idx)
    return carry + out[0, 0, 0, 0].astype(jnp.float32)

t = chain_scalar(gth, x_bf16, idx_nk)
print(f"gather fwd bf16 (N,k={K}):    {t*1e3:8.2f} ms")

# one EdgeMLP-equivalent fwd+bwd: pre-gather matmul + gather + max over k
w = jax.random.normal(jax.random.PRNGKey(5), (2 * C, C), jnp.bfloat16) * 0.05

def edge_fwd_bwd(x, idx, w, carry, i):
    def f(x, w):
        z = edge_mlp_pre_gather(x * (1 + 1e-12 * (i + carry)).astype(x.dtype),
                                idx, w)
        return jnp.max(z, axis=-2).astype(jnp.float32).sum()
    l, (dx, dw) = jax.value_and_grad(f, argnums=(0, 1))(x, w)
    return carry + l * 1e-6 + dx[0, 0, 0].astype(jnp.float32)

t = chain_scalar(edge_fwd_bwd, x_bf16, idx_nk, w)
print(f"EdgeMLP+max fwd+bwd bf16:     {t*1e3:8.2f} ms")

def edge_fwd(x, idx, w, carry, i):
    z = edge_mlp_pre_gather(x * (1 + 1e-12 * (i + carry)).astype(x.dtype),
                            idx, w)
    return carry + jnp.max(z, axis=-2).astype(jnp.float32)[0, 0, 0]

t = chain_scalar(edge_fwd, x_bf16, idx_nk, w)
print(f"EdgeMLP+max fwd bf16:         {t*1e3:8.2f} ms")
