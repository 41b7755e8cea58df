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
    """Candidate triangles of one z-slab of cells, gather-free.

    All table lookups are unrolled statically: corner values are shifted
    *slices* of the slab, and the 16-case marching-tetrahedra table turns
    into a one-hot masked sum — pure element-wise VPU work in the natural
    (z, y, x) layout (the original take_along_axis formulation lowered to
    scalarized gathers, ~50x slower on TPU).

    phi_slab: (sz+1, H, W) plane values for sz cell layers starting at
    global z0. Returns (tris (n, 3, 3), valid (n,)) with
    n = sz*(H-1)*(W-1)*6*2 fixed, candidate-index order = (cell, tet, slot).
    """
    szp, h, w = phi_slab.shape
    sz, cy, cx = szp - 1, h - 1, w - 1
    dt = phi_slab.dtype

    # corner c value field = shifted slice (no gather)
    v = [phi_slab[dz:dz + sz, dy:dy + cy, dx:dx + cx] for dz, dy, dx in _CORNERS]
    bz = jax.lax.broadcasted_iota(dt, (sz, cy, cx), 0) + z0.astype(dt)
    by = jax.lax.broadcasted_iota(dt, (sz, cy, cx), 1)
    bx = jax.lax.broadcasted_iota(dt, (sz, cy, cx), 2)
    base = (bz, by, bx)

    tris_per_tet = []
    valid_per_tet = []
    for t in range(6):
        corners = _TETS[t]
        tv = [v[c] for c in corners]                     # 4 value fields
        ins = [(x < iso) for x in tv]
        n_in = sum(i.astype(jnp.int32) for i in ins)     # 0..4
        case = (ins[0] * 1 + ins[1] * 2 + ins[2] * 4 + ins[3] * 8)

        # 6 edge interpolation points; coordinates are base + static offset
        # + frac * (static delta) — element-wise only.
        edge_coords = []                                  # [(z, y, x)] * 6
        for (a, b) in _TET_EDGES:
            va, vb = tv[a], tv[b]
            diff = vb - va
            frac = (iso - va) / jnp.where(jnp.abs(diff) < 1e-12, 1e-12, diff)
            frac = jnp.clip(frac, 0.0, 1.0)
            oa = _CORNERS[corners[a]]
            ob = _CORNERS[corners[b]]
            coord = tuple(
                base[k] + float(oa[k]) + frac * float(ob[k] - oa[k])
                for k in range(3))
            edge_coords.append(coord)

        # triangles for the 2 slots via one-hot sum over the 14 active cases
        for slot in range(2):
            acc = [[jnp.zeros((sz, cy, cx), dt) for _ in range(3)]
                   for _ in range(3)]                     # [vert][coord]
            for c_id in range(1, 15):
                edges = _TET_TABLE[c_id, slot]
                if edges[0] < 0:
                    continue
                m = (case == c_id).astype(dt)
                for vert in range(3):
                    e = int(edges[vert])
                    for k in range(3):
                        acc[vert][k] = acc[vert][k] + m * edge_coords[e][k]
            tri = jnp.stack([jnp.stack(acc[vert], -1) for vert in range(3)],
                            -2)                           # (sz, cy, cx, 3, 3)
            tris_per_tet.append(tri)
            valid_per_tet.append((n_in >= 1) & (n_in <= 3) if slot == 0
                                 else n_in == 2)

    # candidate order (cell, tet, slot): stack to (sz, cy, cx, 12, 3, 3)
    tris = jnp.stack(tris_per_tet, axis=3)
    valid = jnp.stack(valid_per_tet, axis=3)
    return tris.reshape(-1, 3, 3), valid.reshape(-1)


@functools.partial(jax.jit, static_argnames=("max_tris", "iso", "slab_size"))
def marching_tetrahedra(phi: jnp.ndarray, max_tris: int = 200_000,
                        iso: float = 0.0, slab_size: int = 8):
    """Extract the iso-surface of a (D, H, W) scalar field.

    Cells are processed in z-slabs of `slab_size` layers under lax.scan so
    construction temporaries stay O(slab); candidates accumulate to
    O(cells*12) rows which are compacted ONCE with an index-only
    cumsum/scatter (jnp.nonzero with a static size) + a single payload
    gather — scattering int32 indices instead of 27-float rows is what
    makes the compaction cheap on TPU.

    :return: (tris (max_tris, 3, 3) float zyx vertex coords in voxel units,
              valid (max_tris,) bool, n_tris ())
    Triangles beyond the budget are dropped (count reported in n_tris).
    """
    d, h, w = phi.shape
    if min(d, h, w) < 2:
        raise ValueError(f"marching_tetrahedra needs >= 2 samples per axis, "
                         f"got {phi.shape}")
    n_layers = d - 1
    n_slabs = -(-n_layers // slab_size)
    pad_d = n_slabs * slab_size + 1 - d
    if pad_d:
        # pad with +inf-ish so padded cells produce no triangles
        phi = jnp.concatenate(
            [phi, jnp.full((pad_d, h, w), 1e30, phi.dtype)], axis=0)

    z0s = jnp.arange(n_slabs) * slab_size

    def body(_, z0):
        slab = jax.lax.dynamic_slice_in_dim(phi, z0, slab_size + 1, axis=0)
        return None, _slab_triangles(slab, z0, iso)

    _, (tris, valid) = jax.lax.scan(body, None, z0s)
    tris = tris.reshape(-1, 3, 3)
    valid = valid.reshape(-1)
    n_cand = valid.shape[0]

    n_tris = valid.sum()
    (idx,) = jnp.nonzero(valid, size=max_tris, fill_value=n_cand)
    out = jnp.take(tris, jnp.minimum(idx, n_cand - 1), axis=0)
    out_valid = jnp.arange(max_tris) < jnp.minimum(n_tris, max_tris)
    out = jnp.where(out_valid[:, None, None], out, 0.0)
    return out, out_valid, n_tris


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
