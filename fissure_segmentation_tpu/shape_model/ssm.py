"""Statistical shape model (PCA over corresponding point sets).

Counterpart of reference shape_model/ssm.py:15-109 (`SSM`): fit via SVD of
the centered data matrix (torch.pca_lowrank parity: "eigenvalues" are the
singular values, mode count chosen so the cumulative singular-value fraction
reaches `target_variance`), encode = projection onto eigenvectors, decode =
mean + eigenvectors @ weights.

The model is a frozen pytree of arrays (`SSMParams`) + pure functions — the
fit is a one-shot host/numpy computation before SGD (train.py:40-67), the
encode/decode run on device inside jitted train steps.

The kernelized localized LSSM/LPCA variant (ssm.py:112-157, LPCA/) lives in
lssm.py (`fit_lssm`) and returns the same SSMParams pytree.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SSMParams(NamedTuple):
    mean_shape: jnp.ndarray        # (1, F)
    eigenvalues: jnp.ndarray       # (1, M) singular values
    eigenvectors: jnp.ndarray      # (1, F, M)
    alpha: float = 3.0
    percent_of_variance: float = 0.0

    @property
    def num_modes(self) -> int:
        return self.eigenvalues.shape[-1]

    @property
    def dim(self) -> int:
        return 3


def shape2vector(shapes):
    """(..., P, 3) -> (..., P*3) (reference ssm.py shape2vector)."""
    return shapes.reshape(*shapes.shape[:-2], -1)


def vector2shape(vectors, dim: int = 3):
    return vectors.reshape(*vectors.shape[:-1], -1, dim)


def fit_ssm(train_shapes: np.ndarray, alpha: float = 3.0,
            target_variance: float = 0.95) -> SSMParams:
    """(ssm.py:35-60) train_shapes (N, P, 3) or (N, F)."""
    x = np.asarray(train_shapes, np.float64)
    if x.ndim == 3:
        x = x.reshape(x.shape[0], -1)
    mean = x.mean(0, keepdims=True)
    xc = x - mean
    u, s, vt = np.linalg.svd(xc, full_matrices=False)
    variance_at_sv = np.cumsum(s / s.sum())
    num_modes = int((variance_at_sv <= target_variance).sum()) + 1
    num_modes = min(num_modes, len(s))
    return SSMParams(
        mean_shape=jnp.asarray(mean, jnp.float32),
        eigenvalues=jnp.asarray(s[None, :num_modes], jnp.float32),
        eigenvectors=jnp.asarray(vt.T[None, :, :num_modes], jnp.float32),
        alpha=float(alpha),
        percent_of_variance=float(variance_at_sv[num_modes - 1]),
    )


def ssm_project(params: SSMParams, shapes: jnp.ndarray) -> jnp.ndarray:
    """(B, P, 3) shapes -> (B, M) weights (ssm.py:62-72 forward)."""
    v = shape2vector(shapes)
    return jnp.einsum("bfm,bf->bm",
                      jnp.broadcast_to(params.eigenvectors,
                                       (v.shape[0], *params.eigenvectors.shape[1:])),
                      v - params.mean_shape,
                      precision=jax.lax.Precision.HIGHEST)


def ssm_decode(params: SSMParams, weights: jnp.ndarray) -> jnp.ndarray:
    """(B, M) weights -> (B, P, 3) shapes (ssm.py:74-83)."""
    rec = params.mean_shape + jnp.einsum(
        "bfm,bm->bf",
        jnp.broadcast_to(params.eigenvectors,
                         (weights.shape[0], *params.eigenvectors.shape[1:])),
        weights, precision=jax.lax.Precision.HIGHEST)
    return vector2shape(rec)


def ssm_random_samples(params: SSMParams, rng: jax.Array, n_samples: int) -> jnp.ndarray:
    """Uniform weights in +-alpha*sqrt(eigenvalue) (ssm.py:85-94)."""
    ranges = params.alpha * jnp.sqrt(params.eigenvalues)  # (1, M)
    u = jax.random.uniform(rng, (n_samples, params.num_modes))
    return u * 2 * ranges - ranges


def save_ssm(params: SSMParams, path: str) -> None:
    np.savez(path, mean_shape=np.asarray(params.mean_shape),
             eigenvalues=np.asarray(params.eigenvalues),
             eigenvectors=np.asarray(params.eigenvectors),
             alpha=params.alpha, percent_of_variance=params.percent_of_variance)


def load_ssm(path: str) -> SSMParams:
    z = np.load(path)
    return SSMParams(jnp.asarray(z["mean_shape"]), jnp.asarray(z["eigenvalues"]),
                     jnp.asarray(z["eigenvectors"]), float(z["alpha"]),
                     float(z["percent_of_variance"]))
