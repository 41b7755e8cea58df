"""DSEG-AE: frozen segmentation DGCNN regularized by a frozen PC-AE.

TPU-native counterpart of reference dseg_ae_regularization.py:30-138
(`RegularizedSegDGCNN`, `random_extend_points`, fps fallback): the full cloud
is segmented by subset ensembling, the points of each fissure class are
selected (fixed-shape masked selection instead of torch boolean indexing),
optionally padded with jittered copies, farthest-point-sampled to the AE's
input size, and decoded to a regularized mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.fps import farthest_point_sampling
from ..ops.knn import knn
from .ensemble import ensemble_predict


def random_extend_points(rng: jax.Array, points: jnp.ndarray, valid: jnp.ndarray,
                         desired_n: int):
    """Pad a masked (B, N, 3) cloud with jittered copies of valid points so
    at least `desired_n` are valid (dseg_ae_regularization.py:115-138).
    Output stays (B, N, 3) with an updated mask."""
    b, n, _ = points.shape
    n_valid = valid.sum(-1, keepdims=True)                    # (B, 1)
    _, dist = knn(jnp.where(valid[..., None], points, 1e6), 1,
                  self_loop=False, return_dist=True)
    d = jnp.sqrt(jnp.maximum(dist[..., 0], 0.0))
    d = jnp.where(valid, d, jnp.nan)
    avg = jnp.nanmean(d, axis=-1, keepdims=True)
    std = jnp.where(n_valid > 1, jnp.sqrt(jnp.nanmean(
        (d - avg) ** 2, axis=-1, keepdims=True)), 0.0)

    r_src, r_dir, r_mag = jax.random.split(rng, 3)
    # choose random valid source points per slot
    u = jax.random.uniform(r_src, (b, n))
    src_rank = jnp.floor(u * n_valid).astype(jnp.int32)       # rank among valid
    order = jnp.argsort(jnp.where(valid, 0, 1), axis=-1, stable=True)  # valid first
    src_idx = jnp.take_along_axis(order, src_rank, axis=-1)
    src = jnp.take_along_axis(points, src_idx[..., None], axis=1)
    direction = jax.random.normal(r_dir, src.shape)
    direction = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-12)
    magnitude = jax.random.normal(r_mag, (b, n, 1)) * std[..., None] + avg[..., None]
    jittered = src + direction * magnitude

    slot = jnp.arange(n)[None]
    need = (~valid) & (slot < desired_n)
    new_points = jnp.where(need[..., None], jittered, points)
    return new_points, valid | need


class RegularizedSegDGCNN:
    """Composition model (test-time only, like the reference)."""

    def __init__(self, seg_model, seg_variables, ae_model, ae_variables,
                 n_points_seg: int = 2048, n_points_ae: int = 1024,
                 sample_mode: str = "farthest", random_extend: bool = False):
        self.seg_model, self.seg_variables = seg_model, seg_variables
        self.ae, self.ae_variables = ae_model, ae_variables
        self.n_points_seg = n_points_seg
        self.n_points_ae = n_points_ae
        self.sample_mode = sample_mode
        self.random_extend = random_extend

    def segment(self, pc: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """(N, C_in) full cloud -> (N,) argmax labels (50-subset ensemble)."""
        probs = ensemble_predict(self.seg_model.apply, self.seg_variables, pc,
                                 rng, sample_points=self.n_points_seg)
        return jnp.argmax(probs, axis=-1)

    def reconstruct(self, pc: jnp.ndarray, seg: jnp.ndarray, rng: jax.Array,
                    return_hidden: bool = False):
        """Per fissure class: masked FPS -> PC-AE decode.

        :return: list over classes of (verts (m, 3) [, faces]) or None when
            fewer than k points were segmented
        """
        coords = pc[None, :, :3]
        outputs = []
        num_classes = self.seg_model.num_classes
        for obj in range(1, num_classes):
            m = (seg == obj)[None]
            n_pts = int(m.sum())
            if n_pts < self.ae.k:
                outputs.append(None)
                continue
            rng, r_ext, r_acc = jax.random.split(rng, 3)
            pts, valid = coords, m
            if self.random_extend and n_pts < self.n_points_ae:
                pts, valid = random_extend_points(r_ext, coords, m, self.n_points_ae)
            if self.sample_mode == "farthest":
                idx = farthest_point_sampling(pts, self.n_points_ae, mask=valid)
                sampled = jnp.take_along_axis(pts, idx[..., None], axis=1)
                out = self.ae.apply(self.ae_variables, sampled, train=False,
                                    return_hidden=return_hidden)
            elif self.sample_mode == "accumulate":
                # mean-vertex accumulation over random subsets
                # (folding_net.py:66-80)
                def run(r):
                    score = jnp.where(valid, jax.random.uniform(r, valid.shape),
                                      -jnp.inf)
                    _, sidx = jax.lax.top_k(score, self.n_points_ae)
                    sub = jnp.take_along_axis(pts, sidx[..., None], axis=1)
                    o = self.ae.apply(self.ae_variables, sub, train=False)
                    return o[0] if isinstance(o, tuple) else o
                outs = [run(r) for r in jax.random.split(r_acc, 10)]
                verts = sum(outs) / len(outs)
                if self.ae.decode_mesh:
                    from .folding_net import folding_points_for
                    _, faces = folding_points_for(self.ae.shape_type, self.ae.m,
                                                  True)
                    out = (verts, jnp.asarray(faces))
                else:
                    out = verts
            else:
                raise NotImplementedError(
                    f"Sampling mode {self.sample_mode} not implemented.")
            outputs.append(out)
        return outputs

    def __call__(self, pc: jnp.ndarray, rng: jax.Array, return_hidden=False):
        seg = self.segment(pc, rng)
        return self.reconstruct(pc, seg, rng, return_hidden), seg
