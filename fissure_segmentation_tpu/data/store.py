"""Device-resident point-cloud store and on-device batch sampling.

TPU-first replacement for the reference's host DataLoader + `--all_in_gpu`
option (data.py:373,406; model_trainer.py:84-89): all cases of a fold are
stacked into fixed-shape padded device arrays once; per-step subset sampling
and augmentation then run *inside* the jitted train step — zero host->device
traffic in the hot loop, and the batch dimension shards cleanly under pjit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .augmentation import point_augmentation


class PointCloudStore(NamedTuple):
    """Padded stack of point-cloud cases (device arrays)."""
    coords: jnp.ndarray   # (n_cases, N_max, 3) grid coords, padded with 0
    features: jnp.ndarray  # (n_cases, N_max, F) (F may be 0)
    labels: jnp.ndarray   # (n_cases, N_max) int32, padding = 0
    valid: jnp.ndarray    # (n_cases, N_max) bool

    @property
    def n_cases(self):
        return self.coords.shape[0]

    @property
    def n_feat(self):
        return self.features.shape[-1]


def build_store(cases, pad_to: int | None = None) -> PointCloudStore:
    """Stack a list of case dicts (numpy coords (N,3), labels (N,), optional
    features (N,F)) into a PointCloudStore, padding the point axis."""
    n_max = max(c["coords"].shape[0] for c in cases)
    if pad_to is not None:
        n_max = max(n_max, pad_to)
    n_max = -(-n_max // 128) * 128  # lane-align the point axis
    f = cases[0].get("features")
    n_feat = 0 if f is None else f.shape[1]
    n = len(cases)
    coords = np.zeros((n, n_max, 3), np.float32)
    feats = np.zeros((n, n_max, n_feat), np.float32)
    labels = np.zeros((n, n_max), np.int32)
    valid = np.zeros((n, n_max), bool)
    for i, c in enumerate(cases):
        m = c["coords"].shape[0]
        coords[i, :m] = c["coords"]
        labels[i, :m] = c["labels"]
        valid[i, :m] = True
        if n_feat:
            feats[i, :m] = c["features"]
    return PointCloudStore(jnp.asarray(coords), jnp.asarray(feats),
                           jnp.asarray(labels), jnp.asarray(valid))


def sample_batch(rng: jax.Array, store: PointCloudStore, case_idx: jnp.ndarray,
                 sample_points: int, augment: bool = True,
                 binary: bool = False):
    """Draw a training batch: `sample_points` random valid points per case,
    then random similarity augmentation of the coordinates.

    Parity with PointDataset.__getitem__ (data.py:435-460) — the reference
    samples a random permutation per case; we sample by ranking uniform noise
    with invalid points pushed to the bottom (identical distribution over
    valid points, fixed shapes).

    :param case_idx: (B,) indices into the store
    :return: x (B, S, 3+F), y (B, S) int32
    """
    r_sample, r_aug = jax.random.split(rng)
    b = case_idx.shape[0]
    n_max = store.coords.shape[1]

    noise = jax.random.uniform(r_sample, (b, n_max))
    noise = jnp.where(store.valid[case_idx], noise, 2.0)  # invalid points last
    _, sel = jax.lax.top_k(-noise, sample_points)          # (B, S) smallest noise

    coords = jnp.take_along_axis(store.coords[case_idx], sel[..., None], axis=1)
    labels = jnp.take_along_axis(store.labels[case_idx], sel, axis=1)
    if augment:
        coords, _ = point_augmentation(r_aug, coords)
    if store.n_feat:
        feats = jnp.take_along_axis(store.features[case_idx], sel[..., None], axis=1)
        x = jnp.concatenate([coords, feats], axis=-1)
    else:
        x = coords
    if binary:
        labels = (labels != 0).astype(jnp.int32)
    return x, labels
