"""Point-cloud autoencoder: DGCNN classification encoder + Folding/Deforming
decoder ("PC-AE").

TPU-native counterpart of reference models/folding_net.py:42-288 (itself from
antao97/UnsupervisedPointCloudReconstruction) and the shape generators in
shapes/shape_constructor.py:8-40. Channel-last layout; the open-source-DGCNN
graph build (dgcnn_opensrc.py:34-60: kNN *with* self-loop, dynamic graph over
full feature space, static option over coords) maps to ops.knn/edge_features.

`decode_mesh=True` returns (verts (B, m, 3), faces (F, 3)) with the fixed
plane-mesh topology — static across the batch, so mesh losses can precompute
adjacency (losses/mesh.py MeshTopology).
"""
from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import knn
from .blocks import EdgeMLP, MLPStack, SharedMLP, xavier_normal

SHAPE_TYPES = ["sphere", "gaussian", "plane"]


def get_plane_mesh(n: int = 2025, xrange=(-1.0, 1.0), yrange=(-1.0, 1.0)):
    """Regular triangulated grid (shapes/shape_constructor.py:8-24)."""
    steps = int(math.sqrt(n))
    x = np.linspace(*xrange, steps)
    y = np.linspace(*yrange, steps)
    gx, gy = np.meshgrid(x, y, indexing="ij")
    points = np.stack([gx.reshape(-1), gy.reshape(-1)], 1).astype(np.float32)
    faces = []
    for j in range(steps - 1):
        for i in range(steps - 1):
            cur = j * steps + i
            faces.append([cur, cur + 1, cur + steps])
            faces.append([cur + 1, cur + steps, cur + 1 + steps])
    return points, np.asarray(faces, np.int32)


def get_plane(m: int):
    """±0.3 plane points (shape_constructor.py:35-40)."""
    steps = int(math.sqrt(m))
    x = np.linspace(-0.3, 0.3, steps)
    return np.array([[a, b] for a in x for b in x], np.float32)


def get_sphere(m: int):
    """Fibonacci sphere (replaces the reference's shipped sphere.npy)."""
    i = np.arange(m) + 0.5
    phi = np.arccos(1 - 2 * i / m)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi), np.cos(phi)], 1).astype(np.float32)


def get_gaussian(m: int, seed: int = 0):
    return np.random.default_rng(seed).normal(size=(m, 3)).astype(np.float32)


def folding_points_for(shape_type: str, m: int, decode_mesh: bool):
    """(points (m, d), faces or None) (folding_net.py:154-183)."""
    if shape_type == "plane":
        if decode_mesh:
            pts, faces = get_plane_mesh(n=m, xrange=(-0.3, 0.3), yrange=(-0.3, 0.3))
            return pts, faces
        return get_plane(m), None
    if shape_type == "sphere":
        if decode_mesh:
            raise NotImplementedError("No sphere mesh defined yet")
        return get_sphere(m), None
    if shape_type == "gaussian":
        if decode_mesh:
            raise ValueError("No gaussian mesh is possible.")
        return get_gaussian(m), None
    raise ValueError(f'No shape named "{shape_type}". Use one of {SHAPE_TYPES}.')


class DGCNNClsEncoder(nn.Module):
    """4x single-layer EdgeConv [64,64,128,256] -> 1x1 conv to embedding ->
    global max (folding_net.py:84-144)."""
    k: int
    n_embedding: int
    static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        graph = knn(x[..., :3], self.k, self_loop=True) if self.static else None

        feats = []
        h = x
        for out in (64, 64, 128, 256):
            idx = graph if graph is not None else knn(h, self.k, self_loop=True)
            e = EdgeMLP(out)(h, idx, train)
            h = jnp.max(e, axis=-2)
            feats.append(h)
        h = jnp.concatenate(feats, axis=-1)          # (B, N, 512)
        h = SharedMLP(self.n_embedding)(h, train)
        return jnp.max(h, axis=-2)                   # (B, emb)


class FoldingDecoder(nn.Module):
    """Two-stage folding of a template shape (folding_net.py:186-228).
    Plain Dense+ReLU (with bias, no norm), matching the reference Conv1d."""
    n_embedding: int
    shape_type: str
    m: int
    decode_mesh: bool = True

    def _mlp(self, h, sizes):
        for i, s in enumerate(sizes):
            h = nn.Dense(s, kernel_init=xavier_normal)(h)
            if i < len(sizes) - 1:
                h = nn.relu(h)
        return h

    @nn.compact
    def __call__(self, code: jnp.ndarray, train: bool = False):
        pts, faces = folding_points_for(self.shape_type, self.m, self.decode_mesh)
        grid = jnp.asarray(pts)                                  # (m, d)
        b = code.shape[0]
        code_rep = jnp.broadcast_to(code[:, None, :], (b, self.m, code.shape[-1]))
        grid_rep = jnp.broadcast_to(grid[None], (b, *grid.shape))
        e = self.n_embedding
        f1 = self._mlp(jnp.concatenate([code_rep, grid_rep], -1), [e, e, 3])
        f2 = self._mlp(jnp.concatenate([code_rep, f1], -1), [e, e, 3])
        if self.decode_mesh:
            return f2, jnp.asarray(faces)
        return f2


class DeformingDecoder(nn.Module):
    """Residual offset decoder (folding_net.py:231-288): n layers of
    SharedMLP stacks predicting additive offsets."""
    n_embedding: int
    shape_type: str
    m: int
    decode_mesh: bool = True
    n_deforming_layers: int = 2

    @nn.compact
    def __call__(self, code: jnp.ndarray, train: bool = False):
        pts, faces = folding_points_for(self.shape_type, self.m, self.decode_mesh)
        if pts.shape[1] == 2:  # plane: add z=0 (folding_net.py:267-271)
            pts = np.concatenate([pts, np.zeros((pts.shape[0], 1), np.float32)], 1)
        points = jnp.broadcast_to(jnp.asarray(pts)[None], (code.shape[0], *pts.shape))
        code_rep = jnp.broadcast_to(code[:, None, :],
                                    (code.shape[0], self.m, code.shape[-1]))
        e = self.n_embedding
        for _ in range(self.n_deforming_layers):
            h = jnp.concatenate([code_rep, points], -1)
            h = SharedMLP(e)(h, train)
            h = SharedMLP(e)(h, train)
            offsets = SharedMLP(3, last_layer=True)(h, train)
            points = points + offsets
        if self.decode_mesh:
            return points, jnp.asarray(faces)
        return points


class DGCNNFoldingNet(nn.Module):
    """PC-AE (folding_net.py:42-80). Input (B, N, 3) -> reconstructed
    (B, m, 3) [+ faces if decode_mesh]."""
    k: int
    n_embedding: int
    shape_type: str
    n_input_points: int = 1024
    decode_mesh: bool = True
    deform: bool = False
    static: bool = False
    dec_depth: int = 2

    @property
    def m(self) -> int:
        return int(round(math.sqrt(self.n_input_points))) ** 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, return_hidden: bool = False):
        h = DGCNNClsEncoder(self.k, self.n_embedding, self.static)(x, train)
        if self.deform:
            out = DeformingDecoder(self.n_embedding, self.shape_type, self.m,
                                   self.decode_mesh, self.dec_depth)(h, train)
        else:
            out = FoldingDecoder(self.n_embedding, self.shape_type, self.m,
                                 self.decode_mesh)(h, train)
        if return_hidden:
            return out, h
        return out
