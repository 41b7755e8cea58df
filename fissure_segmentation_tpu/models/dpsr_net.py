"""DPSR-Net: end-to-end point segmentation -> differentiable surface mesh.

TPU-native counterpart of reference models/seg_logits_to_mesh.py:14-116
(`DPSRNet2` + `SoftMesh`, the paper's main variant): per-class softmax scores
are splatted to a grid (DiVRoC -> ops/splat.splat_grid_sample), a normal
field is approximated by Gaussian derivatives of that grid, the spectral
Poisson solver produces an indicator field, and a differentiable iso-surface
extraction yields the mesh (marching tetrahedra with exact autodiff instead
of the reference's pytorch3d-MC + "-normals" backward approximation).

Conventions: the splatted grid is (D, H, W) indexed zyx; the normal-field
channel d is the Gaussian derivative along grid dim d, and points passed to
the spectral solver are given zyx in [0, 1] so channel/dim/coordinate order
all agree. NOTE: the reference transposes the grid and then computes
"grad_x" along what is the z axis (seg_logits_to_mesh.py:95-104) — an
apparent x/z component swap of the normal field; we implement the
mathematically consistent version. The reference SoftMesh also feeds raw
[-1, 1] coords into `spectral_PSR` (seg_logits_to_mesh.py:111) whose
shift/scale normalization samples the field expecting [0, 1] voxel coords
(dpsr_net.py:94 `grid_interp`; DPSR.forward:60 does `(V+1)/2` first on the
intended path) — a second quirk we fix rather than reproduce, which is why
the composed SoftMesh chain is golden-tested per op, not end-to-end.

Output is fixed-shape: (seg_logits (B, N, C),
surface_samples (B, C-1, n_surface_samples, 3) xyz grid coords,
sample_valid (B, C-1, n_surface_samples)).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.dpsr import spectral_psr
from ..ops.marching import marching_tetrahedra, sample_points_on_triangles
from ..ops.splat import splat_grid_sample
from ..utils.filters import gaussian_differentiation
from .access_models import get_point_seg_model_class


def soft_mesh_surface_samples(seg_logits: jnp.ndarray, coords: jnp.ndarray,
                              rng: jax.Array, res=(128, 128, 128),
                              normals_smoothing_sigma: float = 10.0,
                              dpsr_sigma: float = 10.0, dpsr_scale: bool = True,
                              dpsr_shift: bool = True, max_tris: int = 100_000,
                              n_surface_samples: int = 2048,
                              exclude_background: bool = True):
    """SoftMesh (seg_logits_to_mesh.py:57-116), returning surface point
    samples per (batch, class) instead of dynamic Meshes objects.

    :param seg_logits: (B, N, C) raw logits
    :param coords: (B, N, 3) xyz grid coords in [-1, 1]
    :return: (samples (B, C', S, 3) xyz grid coords, valid (B, C', S),
              psr grids (B, C', *res))
    """
    b, n, c = seg_logits.shape
    probs = jax.nn.softmax(seg_logits, axis=-1)
    if exclude_background:
        probs = probs[..., 1:]
        c -= 1

    coords = jnp.clip(coords, -1.0, 1.0)
    # splat per-class scores: (B, C', D, H, W)
    seg_grid = splat_grid_sample(probs, coords, tuple(res))

    # normal field: channel d = d/d(grid dim d); sigma=10, truncate=1.5,
    # constant padding (seg_logits_to_mesh.py:99-104)
    grads = [gaussian_differentiation(seg_grid, normals_smoothing_sigma,
                                      order=1, dim=d, padding_mode="constant",
                                      truncate=1.5)
             for d in range(3)]
    normals = jnp.stack(grads, axis=2)                  # (B, C', 3, D, H, W)
    normals = normals.reshape(b * c, 3, *res)

    # points for the shift normalization: zyx in [0, 1]
    v_zyx = (coords[..., ::-1] + 1.0) / 2.0
    v_rep = jnp.repeat(v_zyx, c, axis=0)                # (B*C', N, 3)
    psr = spectral_psr(v_rep, normals, tuple(res), dpsr_sigma,
                       scale=dpsr_scale, shift=dpsr_shift)  # (B*C', *res)

    # per-instance extraction via lax.map — the measured BEST formulation
    # at these shapes (r5, scripts/prof/prof_mtb_parts.py): fully-batched
    # marching_tetrahedra_batched 717-734 ms, batched-phase-1 hybrid
    # 533 ms, this all-in-map form 332 ms for the 24 x 128^3 f+b block —
    # per instance everything fuses over a VMEM/cache-resident 8 MB field.
    # The r5 wins wired here: single-searchsorted candidate location
    # inside marching_tetrahedra and the inverse-CDF surface sampler.
    keys = jax.random.split(rng, b * c)

    def extract(args):
        phi, key = args
        tris, tvalid, _ = marching_tetrahedra(phi, max_tris=max_tris)
        pts = sample_points_on_triangles(key, tris, tvalid,
                                         n_surface_samples)
        return pts, jnp.broadcast_to(tvalid.any(), (n_surface_samples,))

    pts, valid = jax.lax.map(extract, (psr, keys))
    # voxel zyx -> grid xyz coords
    sz = jnp.asarray(res, jnp.float32) - 1
    pts = (pts / sz) * 2.0 - 1.0
    pts = pts[..., ::-1]
    return (pts.reshape(b, c, n_surface_samples, 3),
            valid.reshape(b, c, n_surface_samples),
            psr.reshape(b, c, *res))


def per_class_surface_samples(seg_logits: jnp.ndarray, coords: jnp.ndarray,
                              rng: jax.Array, res=(128, 128, 128),
                              dpsr_sigma: float = 10.0,
                              dpsr_scale: bool = True, dpsr_shift: bool = True,
                              k_normals: int = 30, max_tris: int = 100_000,
                              n_surface_samples: int = 2048,
                              min_points: int = 4):
    """DPSRNet v1 point->mesh path (reference models/dpsr_net.py:143-180):
    hard-argmax per-class point extraction -> kNN-PCA point normals ->
    spectral DPSR -> iso-surface samples.

    The reference loops over (batch, class) and builds dynamic subsets
    (`coords[b, :, seg_argmax == label]`); here extraction is fixed-shape:
    every class keeps the full (B, N) cloud with a validity mask — masked
    points get zero normals (contributing nothing to the rasterized normal
    field, exactly like being absent) and are excluded from the kNN
    neighborhoods and the DPSR shift normalization via `point_weights`.

    Like the reference (its own `Todo: this loses the gradients` at
    dpsr_net.py:144), the argmax class selection is non-differentiable;
    gradients flow into coords/normals of the selected points only.

    :param seg_logits: (B, N, C) raw logits
    :param coords: (B, N, 3) xyz grid coords in [-1, 1]
    :return: (samples (B, C-1, S, 3) xyz grid coords, valid (B, C-1, S),
              psr grids (B, C-1, *res))
    """
    b, n, cc = seg_logits.shape
    c = cc - 1
    pred = jnp.argmax(seg_logits, axis=-1)                   # (B, N)
    coords = jnp.clip(coords, -1.0, 1.0)
    v_zyx = (coords[..., ::-1] + 1.0) / 2.0                  # (B, N, 3) zyx

    # (B, C', N) per-class masks -> flatten classes into the batch
    class_ids = jnp.arange(1, cc)
    masks = (pred[:, None, :] == class_ids[None, :, None])   # (B, C', N)
    masks_f = masks.reshape(b * c, n)
    v_rep = jnp.repeat(v_zyx, c, axis=0)                     # (B*C', N, 3)

    from ..ops.normals import estimate_pointcloud_normals
    from ..ops.splat import point_rasterize
    k = min(k_normals, n - 1)
    normals = estimate_pointcloud_normals(v_rep, k=k, mask=masks_f)
    normals = jnp.where(masks_f[..., None], normals, 0.0)
    ras = point_rasterize(v_rep, normals, tuple(res))        # (B*C', 3, *res)
    psr = spectral_psr(v_rep, ras, tuple(res), dpsr_sigma,
                       scale=dpsr_scale, shift=dpsr_shift,
                       point_weights=masks_f.astype(jnp.float32))
    # classes with too few points: no reliable surface (reference emits an
    # empty mesh); also guards the scale division for empty normal fields
    class_ok = masks_f.sum(-1) >= min_points                 # (B*C',)
    psr = jnp.where(class_ok[:, None, None, None],
                    jnp.nan_to_num(psr, nan=1.0, posinf=1.0, neginf=1.0),
                    1.0)

    # per-instance extraction — see soft_mesh_surface_samples
    keys = jax.random.split(rng, b * c)

    def extract(args):
        phi, key, ok = args
        tris, tvalid, _ = marching_tetrahedra(phi, max_tris=max_tris)
        pts = sample_points_on_triangles(key, tris, tvalid,
                                         n_surface_samples)
        return pts, jnp.broadcast_to(tvalid.any() & ok,
                                     (n_surface_samples,))

    pts, valid = jax.lax.map(extract, (psr, keys, class_ok))
    sz = jnp.asarray(res, jnp.float32) - 1
    pts = (pts / sz) * 2.0 - 1.0
    pts = pts[..., ::-1]                                     # zyx -> xyz
    return (pts.reshape(b, c, n_surface_samples, 3),
            valid.reshape(b, c, n_surface_samples),
            psr.reshape(b, c, *res))


class DPSRNet(nn.Module):
    """DPSR-Net v1 (reference models/dpsr_net.py:107-185): seg-net +
    per-class hard extraction -> estimated point normals -> spectral DPSR.
    Same output contract as DPSRNet2."""
    seg_net_class: str
    k: int
    in_features: int
    num_classes: int
    spatial_transformer: bool = False
    dynamic: bool = True
    image_feat_module: bool = False
    dpsr_res: Sequence[int] = (128, 128, 128)
    dpsr_sigma: float = 10.0
    dpsr_scale: bool = True
    dpsr_shift: bool = True
    k_normals: int = 30
    max_tris: int = 100_000
    n_surface_samples: int = 2048

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 rng: jax.Array | None = None, return_psr: bool = False):
        seg_cls = get_point_seg_model_class(self.seg_net_class)
        seg_net = seg_cls(k=self.k, in_features=self.in_features,
                          num_classes=self.num_classes,
                          spatial_transformer=self.spatial_transformer,
                          dynamic=self.dynamic,
                          image_feat_module=self.image_feat_module)
        seg_logits = seg_net(x, train)
        coords = x[..., :3]
        if rng is None:
            rng = self.make_rng("surface") if self.has_rng("surface") \
                else jax.random.PRNGKey(0)
        samples, valid, psr = per_class_surface_samples(
            seg_logits, coords, rng, res=tuple(self.dpsr_res),
            dpsr_sigma=self.dpsr_sigma, dpsr_scale=self.dpsr_scale,
            dpsr_shift=self.dpsr_shift, k_normals=self.k_normals,
            max_tris=self.max_tris,
            n_surface_samples=self.n_surface_samples)
        if return_psr:
            return seg_logits, samples, valid, psr
        return seg_logits, samples, valid


class DPSRNet2(nn.Module):
    """Seg-net + SoftMesh (seg_logits_to_mesh.py:14-55)."""
    seg_net_class: str
    k: int
    in_features: int
    num_classes: int
    spatial_transformer: bool = False
    dynamic: bool = True
    image_feat_module: bool = False
    normals_smoothing_sigma: float = 10.0
    dpsr_res: Sequence[int] = (128, 128, 128)
    dpsr_sigma: float = 10.0
    dpsr_scale: bool = True
    dpsr_shift: bool = True
    max_tris: int = 100_000
    n_surface_samples: int = 2048

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 rng: jax.Array | None = None, return_psr: bool = False):
        seg_cls = get_point_seg_model_class(self.seg_net_class)
        seg_net = seg_cls(k=self.k, in_features=self.in_features,
                          num_classes=self.num_classes,
                          spatial_transformer=self.spatial_transformer,
                          dynamic=self.dynamic,
                          image_feat_module=self.image_feat_module)
        seg_logits = seg_net(x, train)
        coords = x[..., :3]
        if rng is None:
            rng = self.make_rng("surface") if self.has_rng("surface") \
                else jax.random.PRNGKey(0)
        samples, valid, psr = soft_mesh_surface_samples(
            seg_logits, coords, rng, res=tuple(self.dpsr_res),
            normals_smoothing_sigma=self.normals_smoothing_sigma,
            dpsr_sigma=self.dpsr_sigma, dpsr_scale=self.dpsr_scale,
            dpsr_shift=self.dpsr_shift, max_tris=self.max_tris,
            n_surface_samples=self.n_surface_samples)
        if return_psr:
            return seg_logits, samples, valid, psr
        return seg_logits, samples, valid
