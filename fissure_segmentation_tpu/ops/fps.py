"""Farthest point sampling.

TPU-native replacement for the `pointops_cuda` furthest-sampling kernel
(models/pointtransformer/pointops.py:16-39) and the pure-python fallback
(dseg_ae_regularization.py:30-43): an iterative max-min scan with fixed
output size — each of the m steps is one fused distance update + argmax over
N points (VPU work), batched via vmap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("m", "use_pallas"))
def farthest_point_sampling(points: jnp.ndarray, m: int,
                            mask: jnp.ndarray | None = None,
                            use_pallas: bool | None = None) -> jnp.ndarray:
    """Select m points maximizing the minimum pairwise distance.

    :param points: (B, N, 3) (or (N, 3))
    :param mask: optional (B, N) validity; invalid points are never selected
        (if fewer than m valid points exist, selections repeat).
    :param use_pallas: route to the single-kernel Pallas implementation
        (ops/pallas/fps.py, ~5x faster, bit-identical). Default: auto on TPU.
    :return: (B, m) int32 indices (first index = 0, like the CUDA kernel)
    """
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and points.shape[-1] <= 8 and m >= 2)
    if use_pallas:
        from .pallas.fps import fps_pallas
        return fps_pallas(points, m, mask)
    if points.ndim == 2:
        out = farthest_point_sampling(points[None], m,
                                      None if mask is None else mask[None])
        return out[0]

    def single(pts, valid):
        n = pts.shape[0]
        start = jnp.asarray(0, jnp.int32) if valid is None else \
            jnp.argmax(valid).astype(jnp.int32)

        def body(carry, _):
            min_d, last = carry
            d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            min_d = jnp.minimum(min_d, d)
            score = min_d if valid is None else jnp.where(valid, min_d, -jnp.inf)
            nxt = jnp.argmax(score).astype(jnp.int32)
            return (min_d, nxt), nxt

        init = (jnp.full((n,), jnp.inf), start)
        _, rest = jax.lax.scan(body, init, None, length=m - 1)
        return jnp.concatenate([start[None], rest])

    if mask is None:
        return jax.vmap(lambda p: single(p, None))(points)
    return jax.vmap(single)(points, mask)
