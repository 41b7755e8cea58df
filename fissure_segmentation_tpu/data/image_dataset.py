"""NIfTI folder index and the voxel-CNN image dataset.

Counterparts of reference data.py:
  `LungData:61`      — lazy index over `*_img_*.nii.gz` + companion files
                       (fissures/lobes/masks/enhanced/meshes/landmarks).
  `ImageDataset:264` — resample-to-spacing, fissure dilation, HU
                       normalization, spatial augmentation, patch batches
                       for the 3-D segmentation CNNs.

TPU-first split of work: NIfTI IO + random patch *cropping* happen on host
(volumes have heterogeneous shapes); everything per-batch and differentiable
— affine warp, mirroring, intensity normalization — runs on device inside
the jitted train step (replaces the reference's host-side batchgenerators
pipeline, augmentations.py:29-49).
"""
from __future__ import annotations

import csv
import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from ..keypoints.features import normalize_img
from ..utils.image_ops import multiple_objects_morphology, resample_equal_spacing
from ..utils.nifti import load_nifti
from .dataset import compute_class_weights


class LungDataIndex:
    """Index of a reference-layout image folder (data.py:61-114).

    For each `{case}_img_{sequence}.nii.gz` records the companion files
    (None when absent): `_fissures_`, `_lobes_`, `_mask_`, `_masklr_`,
    `_fissures_enhanced_`, `_lms_*.csv` landmarks and the
    `{case}_mesh_{sequence}/` fissure/lobe mesh directories.
    """

    def __init__(self, folder: str):
        self.folder = folder
        self.images = sorted(glob(os.path.join(folder, "*_img_*.nii.gz")))
        self.ids, self.fissures, self.lobes, self.lung_masks = [], [], [], []
        self.left_right_masks, self.fissures_enhanced, self.landmarks = [], [], []
        self.fissure_meshes, self.lobe_meshes = [], []
        for img in self.images:
            def _companion(tag, ext=None):
                p = img.replace("_img_", tag)
                if ext is not None:
                    p = p.replace(".nii.gz", ext)
                return p if os.path.exists(p) else None
            self.fissures.append(_companion("_fissures_"))
            self.lobes.append(_companion("_lobes_"))
            self.lung_masks.append(_companion("_mask_"))
            self.left_right_masks.append(_companion("_masklr_"))
            self.fissures_enhanced.append(_companion("_fissures_enhanced_"))
            self.landmarks.append(_companion("_lms_", ".csv"))
            case, _, sequence = os.path.basename(img).split("_")
            sequence = sequence.split(".")[0]
            self.ids.append((case, sequence))
            mesh_dir = os.path.join(folder, f"{case}_mesh_{sequence}")
            fm = sorted(glob(os.path.join(mesh_dir, f"{case}_fissure*_{sequence}.obj")))
            lm = sorted(glob(os.path.join(mesh_dir, f"{case}_lobe*_{sequence}.obj")))
            self.fissure_meshes.append(fm or None)
            self.lobe_meshes.append(lm or None)

    def __len__(self):
        return len(self.images)

    def get_index(self, case: str, sequence: str) -> int:
        return self.ids.index((case, sequence))

    def get_image(self, item: int):
        return load_nifti(self.images[item])

    def _load(self, lst, item):
        return None if lst[item] is None else load_nifti(lst[item])

    def get_fissures(self, item: int):
        return self._load(self.fissures, item)

    def get_lobes(self, item: int):
        return self._load(self.lobes, item)

    def get_lung_mask(self, item: int):
        return self._load(self.lung_masks, item)

    def get_left_right_mask(self, item: int):
        return self._load(self.left_right_masks, item)

    def get_enhanced_fissures(self, item: int):
        return self._load(self.fissures_enhanced, item)

    def get_landmarks(self, item: int):
        if self.landmarks[item] is None:
            return None
        with open(self.landmarks[item]) as fh:
            return np.asarray([[float(v) for v in row]
                               for row in csv.reader(fh)], np.float32)


def random_patch_crop(rng: np.random.Generator, img: np.ndarray,
                      label: np.ndarray, patch_size) -> tuple[np.ndarray, np.ndarray]:
    """Random (host-side) crop of a matching image/label patch; pads with the
    minimum HU / background when the volume is smaller than the patch."""
    ps = np.asarray(patch_size)
    shape = np.asarray(img.shape)
    pad = np.maximum(ps - shape, 0)
    if pad.any():
        pw = [(p // 2, p - p // 2) for p in pad]
        img = np.pad(img, pw, constant_values=float(img.min()))
        label = np.pad(label, pw, constant_values=0)
        shape = np.asarray(img.shape)
    start = np.asarray([rng.integers(0, s - p + 1) for s, p in zip(shape, ps)])
    sl = tuple(slice(st, st + p) for st, p in zip(start, ps))
    return img[sl], label[sl]


_ELASTIC_SIGMA = 12.0  # voxels; midpoint of batchgenerators' default sigma=(10., 13.)


def elastic_displacement_field(rng: jax.Array, patch_shape, alpha) -> jnp.ndarray:
    """Random smooth displacement field, (D, H, W, 3) voxel offsets.

    The reference's batchgenerators `SpatialTransform(do_elastic_deform=True,
    alpha=(0., 1000.))` (augmentations.py:36-38) smooths full-resolution
    U(-1, 1) noise with a Gaussian (default sigma=(10., 13.)) and scales by
    alpha, giving a homogeneous field with
    std = alpha * sqrt(1/3) * (2*sigma*sqrt(pi))**-1.5 (~2.1 voxels at
    alpha=1000) and correlation length ~sigma. The TPU formulation draws
    i.i.d. normal control points on a coarse grid of spacing ~sigma and
    trilinearly upsamples — same std and correlation length, one
    `jax.image.resize` instead of nine long-tap Gaussian conv passes, and
    jit-friendly (the coarse grid shape is static; only alpha is traced).
    """
    target_std = alpha * np.sqrt(1.0 / 3.0) \
        * (2.0 * _ELASTIC_SIGMA * np.sqrt(np.pi)) ** -1.5
    # trilinear interpolation of unit i.i.d. noise keeps on average
    # (E[t^2+(1-t)^2])^3 = (2/3)^3 of the variance between control points
    ctrl_std = target_std / (2.0 / 3.0) ** 1.5
    grid = tuple(max(2, round(s / _ELASTIC_SIGMA) + 1) for s in patch_shape)
    noise = jax.random.normal(rng, (3, *grid)) * ctrl_std
    field = jax.image.resize(noise, (3, *patch_shape), method="linear")
    return jnp.moveaxis(field, 0, -1)


def _warp_coords(rng: jax.Array, patch_shape,
                 rotation_amount: float = 0.26, scale_amount: float = 0.15,
                 elastic_alpha=None):
    """Random (elastic+)rotation+scale index-coordinate field for one patch,
    (D, H, W, 3) zyx coordinates around the patch center.

    Composition order matches batchgenerators' augment_spatial: the elastic
    offsets are added to the centered mesh first, then rotated and scaled
    (reference augmentations.py:36-41 semantics)."""
    from .augmentation import so3_exp_map
    r_rot, r_scale, r_el = jax.random.split(rng, 3)
    v = jax.random.uniform(r_rot, (3,)) * 2 - 1
    axis = v / jnp.maximum(jnp.linalg.norm(v), 1e-8)
    angle = (jax.random.uniform(r_rot, ()) * 2 - 1) * rotation_amount
    rot = so3_exp_map(axis * angle)
    scale = 1.0 + (jax.random.uniform(r_scale, ()) * 2 - 1) * scale_amount
    d, h, w = patch_shape
    zz, yy, xx = jnp.meshgrid(jnp.arange(d), jnp.arange(h), jnp.arange(w),
                              indexing="ij")
    center = jnp.asarray([(d - 1) / 2, (h - 1) / 2, (w - 1) / 2])
    pts = jnp.stack([zz, yy, xx], -1).astype(jnp.float32) - center
    if elastic_alpha is not None:
        pts = pts + elastic_displacement_field(r_el, patch_shape, elastic_alpha)
    warped = (pts.reshape(-1, 3) @ rot) * scale + center
    return warped.reshape(d, h, w, 3)


def augment_image_batch(rng: jax.Array, imgs: jnp.ndarray, labels: jnp.ndarray,
                        mirror_axes=(0, 1, 2), p_rotscale: float = 0.4,
                        noise_std: float = 0.02,
                        elastic_alpha: tuple | None = (0.0, 1000.0)):
    """Device-side spatial + intensity augmentation of an image/label patch
    batch (B, D, H, W) — the reference's batchgenerators SpatialTransform
    (elastic + rotation + scale, augmentations.py:36-41) + Mirror + noise
    chain (augmentations.py:29-49), jit-compiled.

    `elastic_alpha`: per-sample deformation magnitude drawn U(lo, hi)
    (reference alpha=(0., 1000.)); None disables elastic deformation. The
    whole spatial warp (elastic+affine) is gated per sample by `p_rotscale`;
    labels are warped order-0, the image order-1.
    """
    b = imgs.shape[0]
    r_warp, r_gate, r_mirror, r_noise, r_alpha = jax.random.split(rng, 5)
    if elastic_alpha is not None:
        lo, hi = elastic_alpha
        alphas = jax.random.uniform(r_alpha, (b,), minval=lo, maxval=hi)
    else:
        alphas = jnp.zeros((b,))

    def _one(r, img, lbl, gate, alpha):
        coords = _warp_coords(
            r, img.shape,
            elastic_alpha=alpha if elastic_alpha is not None else None)
        czyx = jnp.moveaxis(coords, -1, 0)
        img_w = jax.scipy.ndimage.map_coordinates(img, list(czyx), order=1,
                                                  mode="nearest")
        lbl_w = jax.scipy.ndimage.map_coordinates(lbl.astype(jnp.float32),
                                                  list(czyx), order=0,
                                                  mode="nearest")
        img = jnp.where(gate, img_w, img)
        lbl = jnp.where(gate, lbl_w.astype(lbl.dtype), lbl)
        return img, lbl

    gates = jax.random.uniform(r_gate, (b,)) < p_rotscale
    imgs, labels = jax.vmap(_one)(jax.random.split(r_warp, b), imgs, labels,
                                  gates, alphas)

    # random mirroring, consistent between image and label
    flips = jax.random.uniform(r_mirror, (b, 3)) < 0.5
    for ax in mirror_axes:
        f = flips[:, ax, None, None, None]
        imgs = jnp.where(f, jnp.flip(imgs, axis=ax + 1), imgs)
        labels = jnp.where(f, jnp.flip(labels, axis=ax + 1), labels)

    imgs = imgs + jax.random.normal(r_noise, imgs.shape) * noise_std
    return imgs, labels


class ImageDataset:
    """Voxel-CNN dataset: preprocessed full volumes + random patch batches
    (data.py:264-346 semantics).

    Volumes are resampled to `resample_spacing`, fissure labels dilated to
    survive downsampling (data.py:306-312), intensities normalized to
    [-1, 1]. `sample_batch` crops random patches on host and augments them
    on device.
    """

    def __init__(self, images: list[np.ndarray], labels: list[np.ndarray],
                 ids: list, spacings: list | None = None,
                 resample_spacing: float = 1.5, patch_size=(128, 128, 128),
                 exclude_rhf: bool = False, binary: bool = False,
                 do_augmentation: bool = True, preprocessed: bool = False):
        assert len(images) == len(labels) == len(ids)
        self.patch_size = tuple(patch_size)
        self.resample_spacing = resample_spacing
        self.exclude_rhf = exclude_rhf
        self.binary = binary
        self.do_augmentation = do_augmentation
        self.ids = list(ids)
        self.images, self.labels = [], []
        spacings = spacings or [(1.0, 1.0, 1.0)] * len(images)
        for img, lbl, sp in zip(images, labels, spacings):
            if not preprocessed:
                img, lbl = self._preprocess(img, lbl, sp)
            self.images.append(np.asarray(img, np.float32))
            self.labels.append(np.asarray(lbl, np.int32))

    def _preprocess(self, img: np.ndarray, lbl: np.ndarray, spacing):
        """Resample + dilate + remap + normalize (data.py:291-332)."""
        lbl = np.asarray(lbl, np.int32)
        if self.binary:
            lbl = (lbl != 0).astype(np.int32)
        elif self.exclude_rhf:
            lbl = np.where(lbl == 3, 0, lbl)
        # dilation radius compensating the downsampling factor (data.py:306)
        factors = [sp / self.resample_spacing for sp in spacing]
        radius = max(0, round(1 / min(factors) - 1))
        lblj = jnp.asarray(lbl)
        if radius > 0:
            lblj = multiple_objects_morphology(lblj, radius=radius, mode="dilate")
        imgj = resample_equal_spacing(jnp.asarray(img, jnp.float32), spacing,
                                      self.resample_spacing)
        lblj = resample_equal_spacing(lblj, spacing, self.resample_spacing,
                                      use_nearest_neighbor=True)
        imgj = normalize_img(imgj)
        return np.asarray(imgj), np.asarray(lblj)

    @classmethod
    def from_folder(cls, folder: str, copd: bool = False, **kwargs) -> "ImageDataset":
        index = LungDataIndex(folder)
        images, labels, ids, spacings = [], [], [], []
        for i in range(len(index)):
            if index.fissures[i] is None:
                continue
            if copd and "COPD" not in index.ids[i][0]:
                continue
            img = index.get_image(i)
            fis = index.get_fissures(i)
            images.append(img.array)
            labels.append(fis.array)
            spacings.append(img.spacing)
            ids.append(index.ids[i])
        return cls(images, labels, ids, spacings, **kwargs)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i: int):
        return self.images[i], self.labels[i]

    @property
    def num_classes(self) -> int:
        if self.binary:
            return 2
        return int(max(l.max() for l in self.labels)) + 1

    def get_class_weights(self) -> np.ndarray:
        freq = np.zeros(self.num_classes)
        for l in self.labels:
            freq += np.bincount(l.ravel(), minlength=self.num_classes)[:self.num_classes]
        return compute_class_weights(freq)

    def sample_batch(self, rng_np: np.random.Generator, rng: jax.Array,
                     indices) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(B, D, H, W) float32 patches and int32 label patches."""
        imgs, lbls = zip(*(random_patch_crop(rng_np, self.images[i],
                                             self.labels[i], self.patch_size)
                           for i in indices))
        imgs = jnp.asarray(np.stack(imgs))
        lbls = jnp.asarray(np.stack(lbls))
        if self.do_augmentation:
            imgs, lbls = jax.jit(augment_image_batch)(rng, imgs, lbls)
        return imgs, lbls

    def split_data_set(self, split: dict):
        def _subset(idset, aug):
            sel = [i for i, cid in enumerate(self.ids)
                   if list(cid) in idset or cid[0] in idset]
            ds = ImageDataset([self.images[i] for i in sel],
                              [self.labels[i] for i in sel],
                              [self.ids[i] for i in sel],
                              resample_spacing=self.resample_spacing,
                              patch_size=self.patch_size, binary=self.binary,
                              do_augmentation=aug, preprocessed=True)
            return ds
        norm = lambda xs: [list(x) if isinstance(x, (list, tuple)) else x for x in xs]
        return (_subset(norm(split["train"]), self.do_augmentation),
                _subset(norm(split["val"]), False))
