"""Exact large-N top-k via row-tiled two-stage selection.

`jax.lax.top_k` over a 16.7M-element volume costs ~39 ms on a v5e chip; the
keypoint extractors (keypoints/extraction.py, keypoints/foerstner.py) all end
in exactly that reduction (reference caps clouds at MAX_KPTS=20000,
data_processing/keypoint_extraction.py:19,144-151). This module reshapes the
flat scores to (rows, row_width), takes a cheap per-row top-`row_k`, then a
global top-k over the rows*row_k candidates (~9 ms measured).

That is exact unless some row held more than `row_k` elements that belong in
the global top-k. Exactness is *certified* per call: a row is provably
complete if its smallest selected value is strictly below the global k-th
selected value, or if the row ran out of finite candidates. If any row fails
the certificate (pathologically clustered scores), a `lax.cond` falls back to
the full `lax.top_k` — so for every slot with a *finite* value the result is
bit-identical to `lax.top_k` (descending order, lowest-index-first ties).
Slots whose value is -inf (masked-out overflow — every caller discards them
via a validity mask) may carry different, possibly out-of-range, indices
than `lax.top_k` would.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "row_width", "row_k"))
def masked_top_k(scores: jnp.ndarray, k: int, row_width: int = 4096,
                 row_k: int = 32):
    """Exact (values, flat indices) of the k largest entries of `scores`.

    :param scores: 1-D float array; masked-out entries should be -inf.
    :param k: number of entries to select.
    :param row_width: tile width for the first-stage row top-k.
    :param row_k: per-row candidate count; higher = fewer fallbacks,
        slightly more stage-2 work. Must satisfy rows * row_k >= k for the
        two-stage path to be usable; otherwise falls through to lax.top_k.
    :return: (values (k,), indices (k,) int32) — identical to
        ``jax.lax.top_k(scores, k)``.
    """
    scores = scores.reshape(-1)
    n = scores.shape[0]
    if n <= k:
        return jax.lax.top_k(scores, k)
    rows = -(-n // row_width)
    rk = min(row_k, row_width)
    if rows * rk < k or rows <= 1:
        return jax.lax.top_k(scores, k)

    pad = rows * row_width - n
    tiled = jnp.pad(scores, (0, pad), constant_values=-jnp.inf)
    tiled = tiled.reshape(rows, row_width)
    v, i = jax.lax.top_k(tiled, rk)                      # (rows, rk)
    flat_idx = (i + jnp.arange(rows, dtype=i.dtype)[:, None] * row_width)
    cand_v = v.reshape(-1)
    cand_i = flat_idx.reshape(-1)
    top_v, pos = jax.lax.top_k(cand_v, k)

    # certificate: every row either has its worst candidate strictly under
    # the global cut, or ran out of finite candidates entirely
    kth = top_v[-1]
    row_worst = v[:, -1]
    complete = (row_worst < kth) | ~jnp.isfinite(row_worst)
    exact = jnp.all(complete)

    def fast(_):
        # padding candidates (index >= n) can only surface on -inf slots;
        # clamp so downstream gathers stay in range
        return top_v, jnp.minimum(cand_i[pos], n - 1)

    def exact_fallback(_):
        fv, fi = jax.lax.top_k(scores, k)
        return fv, fi

    return jax.lax.cond(exact, fast, exact_fallback, operand=None)
