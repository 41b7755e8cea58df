"""Where does marching_tetrahedra_packed's dedup encode spend its ~9 ms per
class? (Round-4: after the count-then-emit rewrite the candidate+gather part
of MT costs ~1 ms/class while the packed variant adds ~9 ms/class.)

Components at the serving scale (max_tris=24000 -> 72000 corner keys,
max_verts=16384), chained-scan timed (PERF.md Methodology).

Run: PYTHONPATH=.:$PYTHONPATH python scripts/prof/prof_packed_encode.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/fseg_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 72000
MAX_VERTS = 16384
SENT = np.int32(2 ** 31 - 1)
rng = np.random.default_rng(0)

# realistic key distribution: ~12.5k unique int32 edge keys, ~0.52 V/T ratio
uniq = np.sort(rng.choice(7_100_000, 12500, replace=False)).astype(np.int32)
keys_np = uniq[rng.integers(0, len(uniq), N)].astype(np.int32)
fracs_np = rng.uniform(0, 1, N).astype(np.float32)
keys = jnp.asarray(keys_np)
fracs = jnp.asarray(fracs_np)


def chained(fn, *args, reps=16):
    @jax.jit
    def run(c0):
        def body(c, _):
            out = fn(args[0] + c.astype(args[0].dtype) * 0, *args[1:])
            leaf = jax.tree_util.tree_leaves(out)[-1]
            return (c + leaf.reshape(-1)[0].astype(jnp.int32) * 0), None
        c, _ = jax.lax.scan(body, c0, None, length=reps)
        return c

    int(run(jnp.int32(0)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(run(jnp.int32(0)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


def full_encode(k, f):
    order = jnp.argsort(k)
    sk = k[order]
    sf = f[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_verts = jnp.sum(first & (sk != SENT))
    inv = jnp.zeros_like(rank).at[order].set(rank)
    idx = inv.reshape(-1, 3).astype(jnp.uint16)
    vkey = jnp.full((MAX_VERTS,), SENT, jnp.int32).at[rank].set(sk, mode="drop")
    vfrac_q = jnp.zeros((MAX_VERTS,), jnp.uint16).at[rank].set(
        jnp.round(sf * 65535.0).astype(jnp.uint16), mode="drop")
    return idx, vkey, vfrac_q, n_verts


def full_encode_multisort(k, f):
    """One lax.sort over 3 operands incl. iota (vs argsort + 2 gathers)."""
    iota = jnp.arange(k.shape[0], dtype=jnp.int32)
    sk, sf, order = jax.lax.sort((k, f, iota), num_keys=1)
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_verts = jnp.sum(first & (sk != SENT))
    inv = jnp.zeros_like(rank).at[order].set(rank)
    idx = inv.reshape(-1, 3).astype(jnp.uint16)
    vkey = jnp.full((MAX_VERTS,), SENT, jnp.int32).at[rank].set(sk, mode="drop")
    vfrac_q = jnp.zeros((MAX_VERTS,), jnp.uint16).at[rank].set(
        jnp.round(sf * 65535.0).astype(jnp.uint16), mode="drop")
    return idx, vkey, vfrac_q, n_verts


parts = {
    "argsort": lambda k: jnp.argsort(k),
    "sort3": lambda k: jax.lax.sort(
        (k, fracs, jnp.arange(N, dtype=jnp.int32)), num_keys=1)[0],
    "gather2": lambda k: (k[jnp.argsort(k)],),
    "cumsum": lambda k: jnp.cumsum(k),
    "scatter_inv": lambda k: jnp.zeros_like(k).at[
        jnp.arange(N, dtype=jnp.int32)].set(k),
    "scatter_small": lambda k: jnp.full((MAX_VERTS,), SENT, jnp.int32).at[
        jnp.clip(k, 0, MAX_VERTS - 1)].set(k, mode="drop"),
    "full_encode": lambda k: full_encode(k, fracs),
    "full_multisort": lambda k: full_encode_multisort(k, fracs),
}

# parity of the multisort variant
a = [np.asarray(x) for x in jax.jit(full_encode)(keys, fracs)]
b = [np.asarray(x) for x in jax.jit(full_encode_multisort)(keys, fracs)]
for x, y in zip(a, b):
    assert np.array_equal(x, y)
print("multisort parity OK", flush=True)

for name, fn in parts.items():
    t = chained(fn, keys)
    print(f"{name:16s} {t * 1e3:7.3f} ms", flush=True)
