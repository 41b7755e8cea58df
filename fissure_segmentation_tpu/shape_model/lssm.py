"""Localized statistical shape model (kernelized multi-level PCA).

Counterpart of reference shape_model/ssm.py:112-157 (`LSSM`) and the
LPCA library it wraps (shape_model/LPCA/model.py:23-75 `klpca`,
LPCALib/{subspacemodels,kernels,dists,utils}.py): instead of one global PCA,
the sample covariance is Schur-multiplied with exponential locality kernels
over mean-shape point distances at a halving distance schedule
(model.py:32-42: d_max * 0.5^level, gamma = 1/(2*(2*d)^2)), each level's
leading eigenvectors are extracted, and the per-level subspaces are merged
into one orthonormal basis — yielding modes that can deform one fissure
locally where global PCA only captures dataset-wide variation.

Compact re-implementation: the level-0 subspace is the plain PCA; localized
levels eigendecompose C ∘ K_l directly (dim <= ~3k for the thesis's 3x256
corresponding points — a dense host eigh is cheap); merging = concatenate,
orthonormalize (SVD), re-estimate eigenvalues from the projected data, cut
at target variance. API matches SSMParams so DGSSM consumes either model.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ssm import SSMParams


def _exp_kernel(dist2: np.ndarray, gamma: float, exponent: int = 2) -> np.ndarray:
    """exp(-gamma * d^exponent) (LPCALib/kernels.ExponentialKernel)."""
    d = np.sqrt(np.maximum(dist2, 0.0))
    return np.exp(-gamma * d ** exponent)


def _level_subspace(cov: np.ndarray, kernel: np.ndarray | None,
                    max_rank: int, eps: float = 1e-10):
    """Leading eigenpairs of the (localized) covariance
    (LPCALib/utils.eig_fast_spsd_kernel counterpart, dense)."""
    c = cov if kernel is None else cov * kernel
    w, v = np.linalg.eigh(c)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    keep = min(max_rank, int((w > eps * w[0]).sum()) if w[0] > 0 else 1)
    return w[:keep], v[:, :keep]


def fit_lssm(train_shapes: np.ndarray, num_levels: int = 3,
             alpha: float = 3.0, target_variance: float = 0.95,
             max_rank: int | None = None) -> SSMParams:
    """Fit the localized SSM.

    :param train_shapes: (N, P, 3) corresponding point sets (or (N, F))
    :return: SSMParams with a merged localized basis; "eigenvalues" are the
        std-devs of the training projections (the LPCA convention,
        model.py:70-73) so DGSSM's coefficient scaling works unchanged.
    """
    x = np.asarray(train_shapes, np.float64)
    if x.ndim == 3:
        x = x.reshape(x.shape[0], -1)
    n, f = x.shape
    mean = x.mean(0, keepdims=True)
    xc = x - mean

    # distance schedule over the mean shape (model.py:30-42)
    mean_pts = mean.reshape(-1, 3)
    d2 = ((mean_pts[:, None] - mean_pts[None]) ** 2).sum(-1)  # (P, P)
    max_distance = float(np.sqrt(
        ((mean_pts.min(0) - mean_pts.max(0)) ** 2).sum()))
    schedule = max_distance * 0.5 ** np.arange(num_levels)
    gammas = 1.0 / (2.0 * (2.0 * schedule) ** 2)

    cov = xc.T @ xc / max(n - 1, 1)                  # (F, F)
    d2_full = np.repeat(np.repeat(d2, 3, 0), 3, 1)   # expand to coordinates
    if max_rank is None:
        max_rank = min(n * 10, 200)

    bases = []
    for lvl in range(num_levels):
        kernel = None if lvl == 0 else _exp_kernel(d2_full, gammas[lvl])
        w, v = _level_subspace(cov, kernel, max_rank)
        bases.append(v)

    # merge: orthonormalize the union, re-estimate spectrum from the data
    # (stand-in for merge_subspace_models_closest_rotation_decorr_kernel)
    union = np.concatenate(bases, axis=1)
    q, s, _ = np.linalg.svd(union, full_matrices=False)
    q = q[:, s > 1e-8]
    proj = xc @ q                                   # (N, M)
    var = proj.var(0)
    order = np.argsort(var)[::-1]
    q, var = q[:, order], var[order]
    frac = np.cumsum(var) / var.sum()
    num_modes = min(int((frac <= target_variance).sum()) + 1, q.shape[1],
                    max_rank)
    q, var = q[:, :num_modes], var[:num_modes]

    std = np.sqrt(var)
    return SSMParams(
        mean_shape=jnp.asarray(mean, jnp.float32),
        eigenvalues=jnp.asarray(std[None], jnp.float32),
        eigenvectors=jnp.asarray(q[None], jnp.float32),
        alpha=float(alpha),
        percent_of_variance=float(frac[num_modes - 1]),
    )
