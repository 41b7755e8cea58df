"""Persistent XLA compilation cache for every entry point.

The reference pays CUDA kernel JIT/cuDNN autotune cost once per process and
amortizes it over a long training run; the TPU-native equivalent risk is XLA
recompilation of the big fused graphs (train step, serving dispatch) on every
process start — 20–40 s each on a cold chip. JAX ships a persistent
compilation cache keyed on (HLO, jaxlib, backend, flags); enabling it turns
every warm process start into a disk load (measured: the canonical DGCNN
train-step compile drops from ~31 s to ~2 s on the bench host).

Call :func:`enable_compile_cache` before the first jit dispatch. All repo
entry points (train_*.py scripts, bench.py, serving users, tests/conftest)
do this; library imports do NOT (importing the package must stay
side-effect-free for embedders that manage their own cache policy).

Env overrides:
  FSEG_COMPILE_CACHE=0    disable entirely
  FSEG_COMPILE_CACHE=/dir use a custom cache directory

The default directory is user-scoped ($XDG_CACHE_HOME/fseg_jax or
~/.cache/fseg_jax): a world-shared /tmp path would let another local user
pre-populate the directory JAX deserializes executables from
(cache-poisoning surface) and causes cross-user permission collisions.
"""
from __future__ import annotations

import os


def _default_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(base, "fseg_jax")


def enable_compile_cache(path: str | None = None,
                         min_compile_secs: float = 0.5) -> str | None:
    """Idempotently enable the JAX persistent compilation cache.

    :param path: cache directory (default: $FSEG_COMPILE_CACHE or
        $XDG_CACHE_HOME/fseg_jax or ~/.cache/fseg_jax)
    :param min_compile_secs: only persist executables whose compile took at
        least this long (tiny op-by-op executables aren't worth the disk)
    :return: the cache dir in effect, or None when disabled
    """
    env = os.environ.get("FSEG_COMPILE_CACHE")
    if env in ("0", "false", "False"):
        return None
    if path is None:
        path = env if env else _default_dir()

    import jax

    if jax.config.jax_compilation_cache_dir != path:
        jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
