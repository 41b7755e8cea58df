"""Mesh-backed datasets: PC-AE mesh sampling, point->mesh supervision and
corresponding-point (SSM) targets.

Counterparts of reference data.py:
  `SampleFromMeshDS:687`   — per-(case, object) uniform surface samples with
                             similarity augmentation + jitter, mesh or the
                             samples themselves as target.
  `PointToMeshDS:831` / `PointToMeshAndLabelDataset:865`
                           — keypoint clouds plus ground-truth meshes (DPSR
                             supervision).
  `CorrespondingPointDataset:512` / `CorrespondingPoints:641`
                           — pre-registered corresponding point sets + the
                             inverse pre-registration similarity transform as
                             regression targets for DG-SSM.

TPU-first design: meshes are padded triangle soups stacked into device
arrays once (`MeshStore`); per-step surface sampling, augmentation and
target-transform composition all run inside the jitted train step.
"""
from __future__ import annotations

import copy
import os
from glob import glob
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.marching import sample_points_on_triangles
from ..utils.coords import kpts_to_grid
from ..utils.objio import load_obj, mesh_to_triangle_soup
from .augmentation import (SimilarityTransform, chain_transforms,
                           compose_transform, decompose_similarity_transform,
                           point_augmentation, so3_log_map, transform_points)
from .dataset import PointDataset


def load_meshes(folder: str, case: str, sequence: str,
                obj_name: str = "fissure") -> list[np.ndarray]:
    """All `{case}_{obj_name}{i}_{sequence}.obj` meshes of one case as
    triangle soups (data.py:699-716 layout)."""
    mesh_dir = os.path.join(folder, f"{case}_mesh_{sequence}")
    files = sorted(glob(os.path.join(mesh_dir, f"{case}_{obj_name}*_{sequence}.obj")))
    return [mesh_to_triangle_soup(*load_obj(f)) for f in files]


class MeshStore(NamedTuple):
    """Padded stack of triangle-soup meshes (device arrays)."""
    tris: jnp.ndarray    # (n_items, T_max, 3, 3)
    valid: jnp.ndarray   # (n_items, T_max) bool

    @property
    def n_items(self):
        return self.tris.shape[0]


def build_mesh_store(soups: list[np.ndarray], pad_to: int | None = None) -> MeshStore:
    t_max = max(max(len(s) for s in soups), pad_to or 1)
    t_max = -(-t_max // 128) * 128
    tris = np.zeros((len(soups), t_max, 3, 3), np.float32)
    valid = np.zeros((len(soups), t_max), bool)
    for i, s in enumerate(soups):
        tris[i, :len(s)] = s
        valid[i, :len(s)] = True
    return MeshStore(jnp.asarray(tris), jnp.asarray(valid))


def sample_mesh_batch(rng: jax.Array, store: MeshStore, item_idx: jnp.ndarray,
                      sample_points: int, augment: bool = True,
                      jitter: float = 0.005):
    """Uniform area-weighted surface samples for a batch of store items, with
    the reference's augmentation chain (data.py:754-764: similarity transform
    + gaussian point jitter). Returns (samples (B, S, 3), transform)."""
    r_sample, r_aug, r_jit = jax.random.split(rng, 3)
    rngs = jax.random.split(r_sample, item_idx.shape[0])
    samples = jax.vmap(
        lambda r, i: sample_points_on_triangles(r, store.tris[i], store.valid[i],
                                                sample_points)
    )(rngs, item_idx)
    transform = None
    if augment:
        samples, transform = point_augmentation(r_aug, samples)
        samples = samples + jax.random.normal(r_jit, samples.shape) * jitter
    return samples, transform


class SampleFromMeshDS:
    """Dataset of (case, object) mesh items for PC-AE training
    (data.py:687-790 semantics, device-resident).

    Vertices are normalized to [-1, 1] grid coordinates w.r.t. the case's
    *world extent* (size x spacing, data.py:712-714) at construction; the
    train step then only samples/augments.
    """

    def __init__(self, cases_meshes: list[list[np.ndarray]], ids: list,
                 img_sizes_world: list, sample_points: int = 1024,
                 fixed_object: int | None = None, exclude_rhf: bool = False,
                 mesh_as_target: bool = True, do_augmentation: bool = True):
        assert all(len(m) == len(cases_meshes[0]) for m in cases_meshes), \
            "all cases must have the same number of objects"
        if exclude_rhf:
            cases_meshes = [m[:2] for m in cases_meshes]
        self.num_objects = len(cases_meshes[0])
        self.sample_points = sample_points
        self.fixed_object = fixed_object
        self.mesh_as_target = mesh_as_target
        self.do_augmentation = do_augmentation
        self.ids = list(ids)
        self.img_sizes_world = [np.asarray(s, np.float32) for s in img_sizes_world]

        # normalize to grid coords (world extent as the normalizing "shape",
        # zyx order for kpts_to_grid)
        self._soups = []
        for meshes, size_w in zip(cases_meshes, self.img_sizes_world):
            shape_zyx = size_w[::-1]
            self._soups.append([
                kpts_to_grid(m.reshape(-1, 3), shape_zyx).reshape(-1, 3, 3)
                for m in meshes])

    @classmethod
    def from_folder(cls, folder: str, sample_points: int = 1024,
                    lobes: bool = False, **kwargs) -> "SampleFromMeshDS":
        from ..utils.nifti import load_image_metadata
        mesh_dirs = sorted(glob(os.path.join(folder, "*_mesh_*")))
        if not mesh_dirs:
            raise FileNotFoundError(f"no *_mesh_* directories in {folder}")
        cases_meshes, ids, sizes = [], [], []
        for md in mesh_dirs:
            case, sequence = os.path.basename(md).split("_mesh_")
            meshes = load_meshes(folder, case, sequence,
                                 "lobe" if lobes else "fissure")
            if not meshes:
                continue
            cases_meshes.append(meshes)
            ids.append((case, sequence))
            size, spacing = load_image_metadata(
                os.path.join(folder, f"{case}_img_{sequence}.nii.gz"))
            sizes.append([sz * sp for sz, sp in zip(size, spacing)])
        return cls(cases_meshes, ids, sizes, sample_points, **kwargs)

    def __len__(self):
        return (len(self.ids) * self.num_objects
                if self.fixed_object is None else len(self.ids))

    def continuous_to_pat_index(self, item: int) -> int:
        return item // self.num_objects if self.fixed_object is None else item

    def continuous_to_obj_index(self, item: int) -> int:
        return item % self.num_objects if self.fixed_object is None else self.fixed_object

    def get_id(self, item):
        return self.ids[self.continuous_to_pat_index(item)]

    def get_obj_mesh(self, item) -> np.ndarray:
        """Normalized triangle soup of one (case, object) item."""
        return self._soups[self.continuous_to_pat_index(item)][
            self.continuous_to_obj_index(item)]

    def to_store(self, items=None, pad_to: int | None = None) -> MeshStore:
        items = range(len(self)) if items is None else items
        return build_mesh_store([self.get_obj_mesh(i) for i in items], pad_to)

    def sample_batch(self, rng: jax.Array, store: MeshStore,
                     item_idx: jnp.ndarray, n_target_samples: int | None = None):
        """(inputs (B, S, 3), target surface samples (B, St, 3)).

        With mesh_as_target the target is an *independent* (un-augmented
        geometry transformed consistently) dense sample of the same mesh —
        the chamfer-ready stand-in for the reference's pytorch3d Meshes
        target; otherwise target == inputs (data.py:749-752).
        """
        r_in, r_trg = jax.random.split(rng)
        samples, transform = sample_mesh_batch(
            r_in, store, item_idx, self.sample_points, self.do_augmentation)
        if not self.mesh_as_target:
            return samples, samples
        n_trg = n_target_samples or 4 * self.sample_points
        rngs = jax.random.split(r_trg, item_idx.shape[0])
        target = jax.vmap(
            lambda r, i: sample_points_on_triangles(r, store.tris[i],
                                                    store.valid[i], n_trg)
        )(rngs, item_idx)
        if transform is not None:
            target = transform_points(target, transform)
        return samples, target

    def split_data_set(self, split: dict):
        def _subset(idset):
            sel = [i for i, cid in enumerate(self.ids)
                   if list(cid) in idset or cid[0] in idset]
            ds = SampleFromMeshDS.__new__(SampleFromMeshDS)
            ds.__dict__.update(self.__dict__)
            ds.ids = [self.ids[i] for i in sel]
            ds.img_sizes_world = [self.img_sizes_world[i] for i in sel]
            ds._soups = [self._soups[i] for i in sel]
            return ds
        tr = _subset([list(x) if isinstance(x, (list, tuple)) else x
                      for x in split["train"]])
        vl = _subset([list(x) if isinstance(x, (list, tuple)) else x
                      for x in split["val"]])
        vl.do_augmentation = False
        return tr, vl


class PointToMeshDS(PointDataset):
    """PointDataset plus per-case ground-truth meshes (data.py:831-862):
    the supervision signal for DPSR-Net's chamfer term. Mesh vertices are
    normalized to grid coordinates w.r.t. world extent."""

    def __init__(self, cases: list[dict], meshes: list[list[np.ndarray]],
                 img_sizes_world: list, **kwargs):
        super().__init__(cases, **kwargs)
        self.img_sizes_world = [np.asarray(s, np.float32) for s in img_sizes_world]
        self.meshes = []
        for ms, size_w in zip(meshes, self.img_sizes_world):
            shape_zyx = size_w[::-1]
            self.meshes.append([
                kpts_to_grid(m.reshape(-1, 3), shape_zyx).reshape(-1, 3, 3)
                for m in ms])

    def mesh_store(self, indices=None, pad_to: int | None = None) -> MeshStore:
        """One store item per case = all objects merged (the DPSR loss
        compares the predicted multi-class surface against all fissures)."""
        idx = range(len(self.cases)) if indices is None else indices
        return build_mesh_store(
            [np.concatenate(self.meshes[i], axis=0) for i in idx], pad_to)

    def class_mesh_store(self, label: int, indices=None,
                         pad_to: int | None = None) -> MeshStore:
        idx = range(len(self.cases)) if indices is None else indices
        return build_mesh_store([self.meshes[i][label - 1] for i in idx], pad_to)

    def split_data_set(self, split: dict, fold_nr=None):
        """Split keeping the per-case meshes aligned (data.py:831-862)."""
        def _ids(xs):
            return {tuple(x) if isinstance(x, (list, tuple)) else (x, None)
                    for x in xs}

        def _subset(idset, aug):
            sel = [i for i, c in enumerate(self.cases)
                   if (c["case_id"], c["sequence"]) in idset
                   or (c["case_id"], None) in idset]
            ds = PointToMeshDS.__new__(PointToMeshDS)
            PointDataset.__init__(ds, copy.deepcopy([self.cases[i] for i in sel]),
                                  sample_points=self.sample_points,
                                  binary=self.binary, do_augmentation=aug)
            ds.img_sizes_world = [self.img_sizes_world[i] for i in sel]
            ds.meshes = [self.meshes[i] for i in sel]
            return ds
        return (_subset(_ids(split["train"]), self.do_augmentation),
                _subset(_ids(split["val"]), False))


class CorrespondingPointDataset(PointDataset):
    """Keypoint clouds + corresponding SSM point sets and the similarity
    transform the network must regress (data.py:512-575).

    `corr_points`: (n_cases, P, 3) pre-registered corresponding points in
    *world* coords; `prereg_transforms`: per-case SimilarityTransform that
    registered the case to the mean shape. The regression target for case i
    is norm^-1 ∘ prereg_i^-1 ∘ norm (∘ augmentation), expressed as the 7-dof
    [so3_log | translation | scale] vector.
    """

    def __init__(self, cases: list[dict], corr_points: np.ndarray,
                 prereg_transforms: list[dict], corr_labels: np.ndarray | None = None,
                 do_augmentation: bool = True, **kwargs):
        kwargs.setdefault("exclude_rhf", True)  # parity data.py:517
        super().__init__(cases, do_augmentation=False, **kwargs)
        assert len(cases) == len(corr_points) == len(prereg_transforms)
        self.corr_points = np.asarray(corr_points, np.float32)
        self.corr_labels = (np.zeros(self.corr_points.shape[1], np.int32)
                            if corr_labels is None else np.asarray(corr_labels))
        self.prereg_transforms = prereg_transforms
        self.augment_correspondingly = do_augmentation

        # normalize corresponding points by each case's world extent (zyx)
        def _extent_zyx(c):
            if "size_world" in c:  # xyz, like sitk GetSize()*spacing
                return np.asarray(c["size_world"], np.float32)[::-1]
            return (np.asarray(c["shape"], np.float32)
                    * np.asarray(c.get("spacing", (1.0, 1.0, 1.0)), np.float32))
        self._sizes = np.stack([_extent_zyx(c) for c in cases])

    @property
    def num_classes(self) -> int:
        return int(len(np.unique(self.corr_labels)))

    def normalize_pc(self, pc: np.ndarray, index: int, return_transform=False):
        """World -> grid coords w.r.t. case world extent; optionally also the
        transform as a SimilarityTransform (scale+shift, data.py:617-620)."""
        shape_zyx = self._sizes[index]
        out = kpts_to_grid(pc, shape_zyx)
        if not return_transform:
            return out
        # kpts_to_grid(align_corners=False): out = p * (2/whd) - (whd-1)/whd
        whd = shape_zyx[::-1].astype(np.float32)
        scale = (2.0 / whd).astype(np.float32)          # per-axis (anisotropic)
        shift = (-(whd - 1.0) / whd).astype(np.float32)
        t = SimilarityTransform(jnp.eye(3), jnp.asarray(scale), jnp.asarray(shift))
        return out, t

    def target_for_case(self, index: int) -> tuple[np.ndarray, np.ndarray]:
        """(normalized corresponding points (P, 3), 7-dof transform params).

        The reference composes norm^-1 ∘ prereg^-1 ∘ norm as full 4x4
        matrices and decomposes assuming negligible shear (data.py:550-585).
        We do the same on host: compose in homogeneous row-vector form, then
        polar-decompose the linear part into rotation x isotropic scale.
        """
        corr_norm, norm_t = self.normalize_pc(self.corr_points[index], index,
                                              return_transform=True)
        tr = self.prereg_transforms[index]

        def _mat(rot, scale, trans):  # row-vector convention: [p 1] @ M
            m = np.eye(4, dtype=np.float64)
            m[:3, :3] = np.asarray(rot, np.float64) * np.asarray(scale)
            m[3, :3] = np.asarray(trans, np.float64)
            return m

        m_norm = _mat(np.asarray(norm_t.rotation), np.asarray(norm_t.scaling),
                      np.asarray(norm_t.translation))
        m_prereg = _mat(tr["rotation"], tr["scale"], tr["translation"])
        m = np.linalg.inv(m_norm) @ np.linalg.inv(m_prereg) @ m_norm

        a, trans = m[:3, :3], m[3, :3]
        u, s, vt = np.linalg.svd(a)
        rot = u @ vt
        if np.linalg.det(rot) < 0:  # keep a proper rotation
            u[:, -1] *= -1
            rot = u @ vt
        scale = np.full(3, s.mean())  # isotropic, repeated to match the
        # model's 3-dim scaling head (dg_ssm.py RegressionHead out=3)
        log_r = np.asarray(so3_log_map(jnp.asarray(rot, jnp.float32)))
        params = np.concatenate([log_r, trans.astype(np.float32),
                                 scale.astype(np.float32)])
        return np.asarray(corr_norm, np.float32), params.astype(np.float32)

    def corr_targets(self) -> tuple[np.ndarray, np.ndarray]:
        """Stacked (n_cases, P, 3) normalized corr points and (n_cases, 7)
        transform params for the device store."""
        pts, params = zip(*(self.target_for_case(i) for i in range(len(self))))
        return np.stack(pts), np.stack(params)

    def get_normalized_corr_datamatrix_with_affine_reg(self) -> np.ndarray:
        """(n_cases, P, 3) normalized corresponding points (data.py:625-626)
        — the SSM fitting data matrix."""
        return np.stack([self.normalize_pc(self.corr_points[i], i)
                         for i in range(len(self))])

    def sample_batch(self, rng: jax.Array, store, case_idx: jnp.ndarray,
                     corr_pts: jnp.ndarray, corr_params: jnp.ndarray):
        """Device-side batch: sampled input clouds + (corr points, 7-dof
        params) targets, with augmentation folded into the target transform
        (data.py:560-575: aug happens in moving space, so it chains after)."""
        from .store import sample_batch as _sample_points_batch
        r_pts, r_aug = jax.random.split(rng)
        x, _ = _sample_points_batch(r_pts, store, case_idx, self.sample_points,
                                    augment=False)
        t_corr = corr_pts[case_idx]
        t_params = corr_params[case_idx]
        if self.augment_correspondingly:
            coords, aug_t = point_augmentation(r_aug, x[..., :3])
            x = jnp.concatenate([coords, x[..., 3:]], axis=-1)
            base_t = compose_transform(t_params[:, :3], t_params[:, 3:6],
                                       t_params[:, 6:7])  # isotropic scale
            full_t = chain_transforms(base_t, aug_t)
            log_r, trans, scale = decompose_similarity_transform(full_t)
            t_params = jnp.concatenate(
                [log_r, trans, jnp.broadcast_to(scale, (*scale.shape[:-1], 3))],
                axis=-1)
        return x, (t_corr, t_params)

    def split_data_set(self, split: dict, fold_nr=None):
        tr_ids = {tuple(x) if isinstance(x, (list, tuple)) else (x, None)
                  for x in split["train"]}
        vl_ids = {tuple(x) if isinstance(x, (list, tuple)) else (x, None)
                  for x in split["val"]}

        def _match(c, idset):
            return (c["case_id"], c["sequence"]) in idset \
                or (c["case_id"], None) in idset

        def _subset(idset, aug):
            sel = [i for i, c in enumerate(self.cases) if _match(c, idset)]
            return CorrespondingPointDataset(
                [self.cases[i] for i in sel], self.corr_points[sel],
                [self.prereg_transforms[i] for i in sel], self.corr_labels,
                do_augmentation=aug, sample_points=self.sample_points,
                exclude_rhf=False, binary=self.binary)
        return (_subset(tr_ids, self.augment_correspondingly),
                _subset(vl_ids, False))
