"""Qualitative SSM evaluation: reconstruction overlays, random-sample
galleries, latent-space interpolation strips, and sampled-shape export.

Counterpart of reference shape_model/qualitative_evaluation.py:14-128
(visualize_reconstruction / visualize_samples / latent_interpolation) and
shape_model/create_sampled_data.py:7-18 (decode N random SSM samples and
save them as per-case shape files).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.visualization import point_cloud_on_axis
from .ssm import (SSMParams, ssm_decode, ssm_project,
                  ssm_random_samples)


def _new_3d_axis(n_cols: int = 1, idx: int = 1, fig=None, figsize=None):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    if fig is None:
        fig = plt.figure(figsize=figsize)
    return fig, fig.add_subplot(1, n_cols, idx, projection="3d")


def _finish(fig, savepath, show):
    from matplotlib import pyplot as plt
    if savepath is not None:
        fig.savefig(savepath, bbox_inches="tight", dpi=300)
    if show:  # pragma: no cover - interactive only
        plt.show()
    else:
        plt.close(fig)


def visualize_reconstruction(pred: np.ndarray, targ: np.ndarray,
                             savepath: str | None = None,
                             show: bool = False) -> None:
    """Prediction (red) vs target (blue) point clouds on one 3-D axis
    (qualitative_evaluation.py:14-26)."""
    fig, ax = _new_3d_axis()
    point_cloud_on_axis(ax, np.asarray(pred), c="r",
                        title="SSM reconstruction", label="prediction")
    point_cloud_on_axis(ax, np.asarray(targ), c="b",
                        title="SSM reconstruction", label="target")
    _finish(fig, savepath, show)


def visualize_ssm_samples(params: SSMParams, n_samples: int, out_dir: str,
                          rng: jax.Array | None = None,
                          show: bool = False) -> np.ndarray:
    """Decode `n_samples` random SSM samples and save one plot per sample
    (qualitative_evaluation.py:29-44).

    :return: the decoded (n_samples, N, 3) shapes
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = jax.random.PRNGKey(0) if rng is None else rng
    weights = ssm_random_samples(params, rng, n_samples)
    samples = np.asarray(ssm_decode(params, weights))
    for i, sample in enumerate(samples):
        fig, ax = _new_3d_axis()
        point_cloud_on_axis(ax, sample, c="r", title="SSM sample")
        _finish(fig, os.path.join(out_dir, f"smpl_{i}.png"), show)
    return samples


def latent_interpolation(shape_from: np.ndarray, shape_to: np.ndarray,
                         params: SSMParams, steps: int,
                         savepath: str | None = None,
                         show: bool = False) -> np.ndarray:
    """Linear interpolation strip in SSM weight space between two training
    shapes, flanked by the originals (qualitative_evaluation.py:47-84):
    columns = [shape_from, decode(w_from), ... steps ..., decode(w_to),
    shape_to].

    :return: the (steps+2, N, 3) decoded interpolated shapes
    """
    n_cols = steps + 4
    fig, ax0 = _new_3d_axis(n_cols, 1, figsize=(3 * n_cols, 5))
    point_cloud_on_axis(ax0, np.asarray(shape_from), c="b",
                        title="Training Shape 1")

    w_from = ssm_project(params, jnp.asarray(shape_from)[None])[0]
    w_to = ssm_project(params, jnp.asarray(shape_to)[None])[0]
    fracs = jnp.arange(steps + 2) / (steps + 1)
    weights = w_from[None] + fracs[:, None] * (w_to - w_from)[None]
    decoded = np.asarray(ssm_decode(params, weights))

    for s, shape in enumerate(decoded):
        _, ax = _new_3d_axis(n_cols, s + 2, fig=fig)
        title = ("Reconstruction 1" if s == 0 else
                 "Reconstruction 2" if s == steps + 1 else
                 f"Interpolation {s}")
        point_cloud_on_axis(ax, shape, c="r", title=title)

    _, ax1 = _new_3d_axis(n_cols, n_cols, fig=fig)
    point_cloud_on_axis(ax1, np.asarray(shape_to), c="b",
                        title="Training Shape 2")
    _finish(fig, savepath, show)
    return decoded


def sample_shapes_to_npz(params: SSMParams, n_samples: int, out_dir: str,
                         rng: jax.Array | None = None,
                         objects_per_shape: int = 2) -> list[str]:
    """Decode random SSM samples and write per-case shape files
    (create_sampled_data.py:7-18: 1000 samples split into fixed-size
    objects, saved as SMPL{i:03d}_fixed).

    :param objects_per_shape: the flat point vector is split evenly into
        this many objects (the reference splits into two 1024-pt fissures)
    :return: list of written file paths
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = jax.random.PRNGKey(0) if rng is None else rng
    weights = ssm_random_samples(params, rng, n_samples)
    shapes = np.asarray(ssm_decode(params, weights))
    n_pts = shapes.shape[1] // objects_per_shape
    paths = []
    for i, s in enumerate(shapes):
        objs = np.stack([s[j * n_pts:(j + 1) * n_pts]
                         for j in range(objects_per_shape)])
        path = os.path.join(out_dir, f"SMPL{i:03d}_fixed.npz")
        # save_shape convention (reference ssm.py:170-181): shape + its
        # (identity by default) affine pre-registration. The reference
        # pickles a transform dict into the npz; we store flat unpickled
        # arrays (scale/rotation/translation) — load_shape_npz reads them.
        np.savez_compressed(path, shape=objs, scale=np.float32(1.0),
                            rotation=np.eye(3, dtype=np.float32),
                            translation=np.zeros(3, np.float32))
        paths.append(path)
    return paths


def load_shape_npz(path: str):
    """Read a shape file written by sample_shapes_to_npz (reference
    load_shape, ssm.py:184-198): returns (shape (O, P, 3), transform dict
    with scale/rotation/translation)."""
    with np.load(path) as z:
        return z["shape"], {"scale": float(z["scale"]),
                            "rotation": z["rotation"],
                            "translation": z["translation"]}
