"""Regularized mesh loss: Chamfer on surface samples + edge-length +
normal-consistency + Laplacian smoothing.

Counterpart of reference losses/mesh_loss.py:6-66 (pytorch3d ops). Meshes
are (verts (V, 3), faces (F, 3) int) with *static topology*: the adjacency
structures pytorch3d derives per-call in C++ are precomputed once on host
(`MeshTopology.from_faces`) — in this framework predicted meshes come from
fixed-topology decoders (FoldingNet plane mesh, shapes/shape_constructor.py)
so the topology is a compile-time constant.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .chamfer import chamfer_distance
from ..ops.marching import sample_points_on_triangles


class MeshTopology(NamedTuple):
    edges: np.ndarray           # (E, 2) unique undirected edges
    face_pairs: np.ndarray      # (P, 2) faces sharing an edge
    shared_edges: np.ndarray    # (P, 2) the shared edge verts per pair
    opposite_verts: np.ndarray  # (P, 2) the vert opposite the edge, per face
    num_verts: int

    @classmethod
    def from_faces(cls, faces: np.ndarray, num_verts: int) -> "MeshTopology":
        faces = np.asarray(faces)
        e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [0, 2]]])
        e = np.sort(e, axis=1)
        edges, inverse = np.unique(e, axis=0, return_inverse=True)
        # faces sharing an edge: group face ids by edge id
        face_ids = np.tile(np.arange(len(faces)), 3)
        order = np.argsort(inverse, kind="stable")
        inv_sorted = inverse[order]
        fid_sorted = face_ids[order]
        pairs, shared, opposite = [], [], []
        start = 0
        for i in range(1, len(inv_sorted) + 1):
            if i == len(inv_sorted) or inv_sorted[i] != inv_sorted[start]:
                group = fid_sorted[start:i]
                if len(group) == 2:
                    edge = edges[inv_sorted[start]]
                    pairs.append(group)
                    shared.append(edge)
                    opp = [int(v) for f in group for v in faces[f]
                           if v not in edge.tolist()]
                    opposite.append(opp[:2])
                start = i
        pairs = np.asarray(pairs) if pairs else np.zeros((0, 2), int)
        shared = np.asarray(shared) if shared else np.zeros((0, 2), int)
        opposite = np.asarray(opposite) if opposite else np.zeros((0, 2), int)
        return cls(edges, pairs, shared, opposite, num_verts)


def mesh_edge_loss(verts: jnp.ndarray, topo: MeshTopology,
                   target_length: float = 0.0) -> jnp.ndarray:
    """Mean squared (length - target)^2 over edges (pytorch3d semantics)."""
    e = verts[..., topo.edges[:, 0], :] - verts[..., topo.edges[:, 1], :]
    l = jnp.linalg.norm(e, axis=-1)
    return ((l - target_length) ** 2).mean()


def mesh_normal_consistency(verts: jnp.ndarray, faces: np.ndarray,
                            topo: MeshTopology) -> jnp.ndarray:
    """pytorch3d mesh_normal_consistency semantics: for each edge shared by
    two faces with opposite vertices a/b, n0 = (v1-v0) x (a-v0),
    n1 = (v1-v0) x (b-v0), loss = mean(1 - cos(n0, -n1)) — winding-
    independent (zero on a flat mesh regardless of face orientation)."""
    if len(topo.face_pairs) == 0:
        return jnp.asarray(0.0)
    v0 = verts[..., topo.shared_edges[:, 0], :]
    v1 = verts[..., topo.shared_edges[:, 1], :]
    a = verts[..., topo.opposite_verts[:, 0], :]
    b = verts[..., topo.opposite_verts[:, 1], :]
    e = v1 - v0
    n0 = jnp.cross(e, a - v0)
    n1 = jnp.cross(e, b - v0)
    cos = jnp.sum(n0 * -n1, axis=-1) / jnp.maximum(
        jnp.linalg.norm(n0, axis=-1) * jnp.linalg.norm(n1, axis=-1), 1e-12)
    return (1.0 - cos).mean()


def mesh_laplacian_smoothing(verts: jnp.ndarray, topo: MeshTopology) -> jnp.ndarray:
    """Uniform Laplacian: mean over verts of ||mean(neighbors) - v||."""
    v = topo.num_verts
    deg = jnp.zeros((v,)).at[topo.edges[:, 0]].add(1.0).at[topo.edges[:, 1]].add(1.0)
    nb_sum = jnp.zeros((*verts.shape[:-2], v, 3))
    nb_sum = nb_sum.at[..., topo.edges[:, 0], :].add(verts[..., topo.edges[:, 1], :])
    nb_sum = nb_sum.at[..., topo.edges[:, 1], :].add(verts[..., topo.edges[:, 0], :])
    lap = nb_sum / jnp.maximum(deg, 1.0)[:, None] - verts
    lap = jnp.where((deg > 0)[:, None], lap, 0.0)
    return jnp.linalg.norm(lap, axis=-1).mean()


def make_regularized_mesh_loss(w_chamfer: float = 1.0, w_edge_length: float = 1.0,
                               w_normal_consistency: float = 0.1,
                               w_laplacian: float = 0.1, n_samples: int = 2048):
    """Returns loss(pred, target, *, faces, topo, rng) -> (scalar, comps).

    pred/target: (B, V, 3) vertex batches sharing the static (F, 3) `faces`
    topology (or target given directly as (B, M, 3) point samples).
    """

    def loss(pred_verts, target, *, faces, topo: MeshTopology,
             target_faces=None, target_topo: MeshTopology | None = None,
             rng: jax.Array = jax.random.PRNGKey(0)):
        comps = {}
        total = 0.0
        if w_chamfer > 0:
            r1, r2 = jax.random.split(rng)
            tris_p = pred_verts[..., np.asarray(faces), :]  # (B, F, 3, 3)
            sample_p = jax.vmap(
                lambda t, r: sample_points_on_triangles(
                    r, t, jnp.ones(t.shape[0], bool), n_samples),
                in_axes=(0, None))(tris_p, r1)
            if target_faces is not None:
                tris_t = target[..., np.asarray(target_faces), :]
                sample_t = jax.vmap(
                    lambda t, r: sample_points_on_triangles(
                        r, t, jnp.ones(t.shape[0], bool), n_samples),
                    in_axes=(0, None))(tris_t, r2)
            else:
                sample_t = target
            cham = chamfer_distance(sample_p, sample_t)
            comps["Chamfer"] = cham
            total = total + w_chamfer * cham
        if w_edge_length > 0:
            el = mesh_edge_loss(pred_verts, topo)
            comps["Edge Length"] = el
            total = total + w_edge_length * el
        if w_normal_consistency > 0:
            nc = mesh_normal_consistency(pred_verts, np.asarray(faces), topo)
            comps["Normal Consistency"] = nc
            total = total + w_normal_consistency * nc
        if w_laplacian > 0:
            lap = mesh_laplacian_smoothing(pred_verts, topo)
            comps["Laplacian"] = lap
            total = total + w_laplacian * lap
        return total, comps

    return loss
