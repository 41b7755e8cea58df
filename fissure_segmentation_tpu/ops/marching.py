"""Differentiable iso-surface extraction: marching tetrahedra.

Replaces the reference's differentiable marching cubes
(models/dpsr_utils.py:44-99), which calls pytorch3d's C++ MC forward and
approximates the backward as dV/dPSR = -normals splatted back to the grid via
DiVRoC. Here each grid cell is split into 6 tetrahedra and triangles are
emitted per-tet from a 16-case rule that is *derived in code* (no copied
tables). Vertex positions are differentiable linear interpolations along tet
edges, so JAX autodiff produces the exact gradient w.r.t. the scalar field —
strictly better than the reference's -normals approximation.

TPU design constraints: output is a fixed-budget (max_tris, 3, 3) vertex
buffer + validity mask (no dynamic shapes); topology indices are integer
(non-differentiable) while positions carry gradients.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 6-tetrahedra decomposition of the unit cube (corner ids 0..7, bit order
# (z, y, x): corner = z*4 + y*2 + x). All 6 tets share the main diagonal 0-7.
_TETS = np.array([
    [0, 5, 1, 7],
    [0, 1, 3, 7],
    [0, 3, 2, 7],
    [0, 2, 6, 7],
    [0, 6, 4, 7],
    [0, 4, 5, 7],
])

# corner offsets (z, y, x) for the 8 cube corners
_CORNERS = np.array([[z, y, x] for z in (0, 1) for y in (0, 1) for x in (0, 1)])
# corner id c has offset _CORNERS[c] with c = z*4+y*2+x
_CORNERS = np.array([[ (c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)])

# The 6 edges of a tetrahedron as (vertex_a, vertex_b) local ids 0..3
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])


def _build_tet_table():
    """Derive the marching-tetrahedra triangle table for the 16 sign cases.

    Case bit i set <=> tet vertex i is "inside" (value < iso). Each case
    yields 0, 1 or 2 triangles given as triples of tet-edge ids; -1 padding.
    Triangle orientation is not normalized (downstream users — chamfer /
    distance metrics / point sampling — are orientation-agnostic).
    """
    table = np.full((16, 2, 3), -1, np.int32)
    edge_id = {tuple(sorted(e)): i for i, e in enumerate(_TET_EDGES.tolist())}
    for case in range(1, 15):
        inside = [i for i in range(4) if case & (1 << i)]
        outside = [i for i in range(4) if not case & (1 << i)]
        if len(inside) == 1:
            a = inside[0]
            tri = [edge_id[tuple(sorted((a, b)))] for b in outside]
            table[case, 0] = tri
        elif len(inside) == 3:
            a = outside[0]
            tri = [edge_id[tuple(sorted((a, b)))] for b in inside]
            table[case, 0] = tri
        else:  # 2 inside, 2 outside -> quad -> 2 triangles
            a, b = inside
            c, d = outside
            e_ac = edge_id[tuple(sorted((a, c)))]
            e_ad = edge_id[tuple(sorted((a, d)))]
            e_bc = edge_id[tuple(sorted((b, c)))]
            e_bd = edge_id[tuple(sorted((b, d)))]
            # quad ac-ad-bd-bc split along ac-bd
            table[case, 0] = [e_ac, e_ad, e_bd]
            table[case, 1] = [e_ac, e_bd, e_bc]
    return table


_TET_TABLE = _build_tet_table()
_TET_TRI_COUNT = (_TET_TABLE[:, :, 0] >= 0).sum(axis=1).astype(np.int32)


def _slab_triangles(phi_slab: jnp.ndarray, z0, iso: float):
    """Triangles of one z-slab of cells. phi_slab: (sz+1, H, W) plane values
    for sz cell layers starting at global z0. Returns (tris (n, 3, 3),
    valid (n,)) with n = sz*(H-1)*(W-1)*6*2 fixed."""
    szp, h, w = phi_slab.shape
    sz = szp - 1
    cz, cy, cx = sz, h - 1, w - 1

    bz, by, bx = jnp.meshgrid(jnp.arange(cz), jnp.arange(cy), jnp.arange(cx),
                              indexing="ij")
    base = jnp.stack([bz, by, bx], -1).reshape(-1, 3)

    corner_off = jnp.asarray(_CORNERS)
    cidx = base[:, None, :] + corner_off[None]
    vals = phi_slab[cidx[..., 0], cidx[..., 1], cidx[..., 2]]  # (n_cells, 8)

    tets = jnp.asarray(_TETS)
    table = jnp.asarray(_TET_TABLE)
    tet_edges = jnp.asarray(_TET_EDGES)

    tet_vals = vals[:, tets]                                  # (n_cells, 6, 4)
    tet_pos = (base[:, None, None, :]
               + corner_off[tets][None]).astype(phi_slab.dtype)

    inside = tet_vals < iso
    case = (inside[..., 0] * 1 + inside[..., 1] * 2
            + inside[..., 2] * 4 + inside[..., 3] * 8)

    va = jnp.take_along_axis(tet_vals[..., None, :],
                             tet_edges[None, None, :, :1], axis=-1)[..., 0]
    vb = jnp.take_along_axis(tet_vals[..., None, :],
                             tet_edges[None, None, :, 1:], axis=-1)[..., 0]
    t = (iso - va) / jnp.where(jnp.abs(vb - va) < 1e-12, 1e-12, vb - va)
    t = jnp.clip(t, 0.0, 1.0)
    pa = jnp.take_along_axis(tet_pos, tet_edges[None, None, :, 0][..., None]
                             .repeat(3, -1), axis=-2)
    pb = jnp.take_along_axis(tet_pos, tet_edges[None, None, :, 1][..., None]
                             .repeat(3, -1), axis=-2)
    edge_pts = pa + t[..., None] * (pb - pa)                  # (n_cells, 6, 6, 3)

    tri_edges = table[case]                                   # (n_cells, 6, 2, 3)
    safe_edges = jnp.maximum(tri_edges, 0)
    tris = jnp.take_along_axis(
        edge_pts[:, :, None, :, :],
        safe_edges[..., None].repeat(3, -1),
        axis=-2)
    tri_valid = tri_edges[..., 0] >= 0
    tris = tris.reshape(-1, 3, 3)
    tris = tris.at[..., 0].add(z0.astype(tris.dtype))  # shift into global z
    return tris, tri_valid.reshape(-1)


@functools.partial(jax.jit, static_argnames=("max_tris", "iso", "slab_size"))
def marching_tetrahedra(phi: jnp.ndarray, max_tris: int = 200_000,
                        iso: float = 0.0, slab_size: int = 8):
    """Extract the iso-surface of a (D, H, W) scalar field.

    Cells are processed in z-slabs of `slab_size` layers under lax.scan so
    peak memory is O(slab) not O(volume) — required for 128^3 DPSR grids.

    :return: (tris (max_tris, 3, 3) float zyx vertex coords in voxel units,
              valid (max_tris,) bool, n_tris ())
    Triangles beyond the budget are dropped (count reported in n_tris).
    """
    d, h, w = phi.shape
    n_layers = d - 1
    n_slabs = -(-n_layers // slab_size)
    pad_d = n_slabs * slab_size + 1 - d
    if pad_d:
        # pad with +inf-ish so padded cells produce no triangles
        phi = jnp.concatenate(
            [phi, jnp.full((pad_d, h, w), 1e30, phi.dtype)], axis=0)

    z0s = jnp.arange(n_slabs) * slab_size

    def body(carry, z0):
        out, n_written = carry
        slab = jax.lax.dynamic_slice_in_dim(phi, z0, slab_size + 1, axis=0)
        tris, valid = _slab_triangles(slab, z0, iso)
        local_dest = jnp.cumsum(valid) - 1
        dest = jnp.where(valid, jnp.minimum(n_written + local_dest, max_tris),
                         max_tris)
        out = out.at[dest].set(tris, mode="drop")
        return (out, n_written + valid.sum()), None

    out0 = jnp.zeros((max_tris + 1, 3, 3), phi.dtype)
    (out, n_tris), _ = jax.lax.scan(body, (out0, jnp.asarray(0)), z0s)
    out = out[:max_tris]
    valid = jnp.arange(max_tris) < jnp.minimum(n_tris, max_tris)
    return out, valid, n_tris


def triangles_to_mesh(tris: jnp.ndarray):
    """(T, 3, 3) triangle soup -> (verts (3T, 3), faces (T, 3))."""
    verts = tris.reshape(-1, 3)
    faces = jnp.arange(verts.shape[0], dtype=jnp.int32).reshape(-1, 3)
    return verts, faces


def sample_points_on_triangles(rng: jax.Array, tris: jnp.ndarray,
                               valid: jnp.ndarray, n_samples: int):
    """Area-weighted uniform surface samples from a (possibly padded)
    triangle soup — the device-side equivalent of pytorch3d's
    sample_points_from_meshes used by the mesh/DPSR losses."""
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    area = 0.5 * jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)
    area = jnp.where(valid, area, 0.0)
    r_idx, r_uv = jax.random.split(rng)
    probs = area / jnp.maximum(area.sum(), 1e-12)
    idx = jax.random.categorical(r_idx, jnp.log(probs + 1e-30), shape=(n_samples,))
    uv = jax.random.uniform(r_uv, (n_samples, 2))
    u = jnp.sqrt(uv[:, :1])
    v = uv[:, 1:]
    w0, w1, w2 = 1 - u, u * (1 - v), u * v
    return w0 * a[idx] + w1 * b[idx] + w2 * c[idx]
