"""Label-space preprocessing: lobes <-> fissures, lung masks, GT meshes.

Counterparts of the reference's ground-truth generation layer:
  `find_fissures` (preprocess_totalsegmentator_dataset.py:83-131) — fissures
      as the overlap of cross-dilated lobe one-hot channels.
  `generate_lung_mask` (preprocess_totalsegmentator_dataset.py:133-140).
  `find_lobes` (data_processing/find_lobes.py:95-182) — fissures -> lobes via
      morphology + connected components + anatomical relabelling.
  `compute_surface_mesh_marching_cubes` (find_lobes.py:185-220) — here via
      the device marching-tetrahedra kernel on a smoothed indicator.

Device work (morphology, one-hot dilation, marching) runs in XLA; the only
host steps are connected-component labelling and centroid sorting (scipy,
data-dependent shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.filters import filter_1d, max_pool_same, smooth


def binary_morphology(mask: jnp.ndarray, radius: int, mode: str) -> jnp.ndarray:
    """Binary dilate/erode/open/close with a box structuring element of
    half-width `radius` (stands in for the reference's sitk ball kernels)."""
    m = mask.astype(jnp.float32)
    k = 2 * radius + 1
    if mode == "dilate":
        return max_pool_same(m, k) > 0.5
    if mode == "erode":
        return max_pool_same(1.0 - m, k) < 0.5
    if mode == "open":
        return binary_morphology(binary_morphology(mask, radius, "erode"),
                                 radius, "dilate")
    if mode == "close":
        return binary_morphology(binary_morphology(mask, radius, "dilate"),
                                 radius, "erode")
    raise ValueError(f"unknown morphology mode {mode}")


def _cross_dilate_one_hot(labels: jnp.ndarray, n_labels: int) -> jnp.ndarray:
    """One-hot encode a labelmap and dilate each channel with the
    6-neighborhood cross kernel (find_lobes.py:60-72)."""
    one_hot = jax.nn.one_hot(labels, n_labels + 1, axis=0, dtype=jnp.float32)
    k = jnp.asarray([1.0, 1.0, 1.0])
    acc = one_hot
    for d in range(3):
        acc = acc + filter_1d(one_hot, k, d, padding_mode="constant")
    return acc > 0.5


def fissures_between_lobes(lobes: jnp.ndarray, n_lobes: int | None = None) -> jnp.ndarray:
    """Fissure labels from a (filled) lobe labelmap: voxels where the
    cross-dilated one-hot channels of adjacent lobes overlap
    (find_lobes.py:55-90 / preprocess_totalsegmentator_dataset.py:83-131).

    Lobe labels: 1 RLL, 2 RUL, 3 LLL, 4 LUL, 5 RML (optional).
    Fissures: 1 = left oblique (3&4), 2 = right oblique (1&2, +1&5),
    3 = right horizontal (2&5).
    """
    if n_lobes is None:
        n_lobes = int(jnp.max(lobes))
    dil = _cross_dilate_one_hot(lobes, n_lobes)
    fissures = jnp.zeros(lobes.shape, jnp.uint8)
    fissures = jnp.where(dil[3] & dil[4], jnp.uint8(1), fissures)
    rof = dil[1] & dil[2]
    if n_lobes >= 5:
        rof = rof | (dil[1] & dil[5])
    fissures = jnp.where(rof, jnp.uint8(2), fissures)
    if n_lobes >= 5:
        fissures = jnp.where(dil[2] & dil[5], jnp.uint8(3), fissures)
    return fissures


# find_fissures is the preprocessing-time name (complete lobe GT in, no
# random-walk filling needed, preprocess_totalsegmentator_dataset.py:83)
find_fissures = fissures_between_lobes


def generate_lung_mask(lobes: jnp.ndarray) -> jnp.ndarray:
    """(preprocess_totalsegmentator_dataset.py:133-140)"""
    return lobes > 0


def check_left_right_lung_plausible(component_sizes,
                                    max_volume_ratio: float = 10.0) -> bool:
    """At least two components and the biggest at most `max_volume_ratio`
    times the second (process_lung_mask.py:11-28)."""
    sizes = sorted(component_sizes, reverse=True)
    if len(sizes) < 2:
        return False
    return sizes[0] / sizes[1] <= max_volume_ratio


def binary_lung_mask_to_left_right(lung_mask: np.ndarray, left_label: int = 1,
                                   right_label: int = 2,
                                   max_volume_ratio: float = 10.0,
                                   max_opening_radius: int = 13) -> np.ndarray:
    """Binary lung mask -> left(1)/right(2) mask, the producer of the
    `_masklr_` files ImageDataset consumes.

    Reference pipeline (process_lung_mask.py:31-93): connected components;
    if the two biggest are implausible (merged lungs), binary-open with
    growing radius (3, 5, 7, ...) until they detach; keep the 2 biggest;
    the component with the *smaller* centroid x is the right lung; restore
    voxels lost to the opening by nearest-label (Euclidean distance
    transform) inside the original mask.

    Deviations: the native 26-CC labeler replaces sitk; the opening-radius
    loop is capped at `max_opening_radius` (the reference recurses forever
    on a single-lung scan) — past the cap the biggest components are used
    as-is.

    :param lung_mask: (D, H, W) zyx binary mask
    :return: (D, H, W) int32 labelmap {0, left_label, right_label}
    """
    from scipy.ndimage import distance_transform_edt

    from ..native import cc_label_3d

    mask0 = np.asarray(lung_mask) > 0
    mask = mask0
    opened = False
    radius = 3
    while True:
        comp, n = cc_label_3d(mask)
        sizes = np.bincount(comp.ravel(), minlength=n + 1)[1:]
        if check_left_right_lung_plausible(sizes, max_volume_ratio) \
                or radius > max_opening_radius or n == 0:
            break
        mask = np.asarray(binary_morphology(jnp.asarray(mask), radius,
                                            "open"))
        radius += 2
        opened = True

    if n == 0:
        return np.zeros(mask0.shape, np.int32)
    biggest = np.argsort(sizes)[::-1][:2] + 1  # component ids of 2 largest
    out = np.zeros(mask0.shape, np.int32)
    # smaller centroid x is the right lung (process_lung_mask.py:71-77)
    xs = [np.nonzero(comp == b)[2].mean() if (comp == b).any() else np.inf
          for b in biggest]
    if len(biggest) == 1 or not np.isfinite(xs[-1]):
        out[comp == biggest[0]] = left_label
        labels_present = (left_label,)
    else:
        right_comp, left_comp = biggest[np.argsort(xs)]
        out[comp == left_comp] = left_label
        out[comp == right_comp] = right_label
        labels_present = (left_label, right_label)

    if opened:
        # restore opened-away voxels to the nearest present lung half
        # (process_lung_mask.py:81-91) — also in the single-label case,
        # otherwise voxels eroded by the opening stay unlabeled
        dist = np.stack([distance_transform_edt(out != lbl)
                         for lbl in labels_present])
        nearest = np.asarray(labels_present)[np.argmin(dist, axis=0)]
        out = np.where(mask0, np.where(out != 0, out, nearest), 0)
    return out.astype(np.int32)


def find_non_zero_range(mask: np.ndarray, axis: int = 0, open_radius: int = 2) -> tuple[int, int]:
    """[lo, hi) index range along `axis` containing non-zero voxels, after a
    small binary opening to ignore mis-segmentation specks
    (preprocess_totalsegmentator_dataset.py `find_non_zero_ranges`;
    open_radius=0 = the raw range of the v1 script, which has no opening)."""
    if open_radius == 0:
        m = np.asarray(mask) != 0
    else:
        m = np.asarray(binary_morphology(jnp.asarray(mask != 0), open_radius,
                                         "open"))
    proj = m.any(axis=tuple(a for a in range(m.ndim) if a != axis))
    nz = np.nonzero(proj)[0]
    if len(nz) == 0:
        return 0, mask.shape[axis]
    return int(nz[0]), int(nz[-1]) + 1


def label_to_mesh(labelmap: np.ndarray, label: int,
                  mask: np.ndarray | None = None, sigma: float = 1.0,
                  max_tris: int = 200_000):
    """Surface mesh of one labelled object via marching tetrahedra on a
    smoothed indicator (counterpart of find_lobes.py:185-220's
    skimage marching cubes). Returns (tris (T, 3, 3) world xyz, valid (T,))."""
    from ..ops.marching import marching_tetrahedra
    ind = jnp.asarray(labelmap == label, jnp.float32)
    if mask is not None:
        ind = jnp.where(jnp.asarray(mask), ind, 0.0)
    phi = 0.5 - smooth(ind[None], sigma)[0] if sigma else 0.5 - ind
    tris, valid, _ = marching_tetrahedra(phi, max_tris=max_tris)
    return tris[..., ::-1], valid  # zyx voxel -> world xyz


def find_lobes(fissures: jnp.ndarray, lung_mask: jnp.ndarray,
               exclude_rhf: bool = False, fill: bool = True,
               cg_iters: int = 500, erode_radius: int | None = None,
               close_radius: int | None = None,
               dilate_radius: int | None = None,
               open_radius: int | None = None):
    """Fissure segmentation -> lobe labelmap (find_lobes.py:95-182).

    Pipeline: erode lung mask, cut it by the (binary, closed+dilated)
    fissures, open the result, take the 4/5 largest connected components,
    relabel them anatomically by centroid (x: right/left body half; z:
    inferior/superior), then optionally grow back to fill the whole lung
    mask with the random-walk solver.

    Morphology radii default to the reference's full-size-CT values
    (2/2/2/4, find_lobes.py:107-148) scaled down for small volumes —
    on a 64^3 demo case radius-4 opening would erase whole lobes.

    :return: (lobes (D, H, W) int32, success bool)
    """
    from scipy import ndimage
    # clamp to <= 1.0 so full-size (>=256) CTs keep the reference's fixed
    # 2/2/2/4 radii; only small demo volumes scale the radii down
    scale = min(1.0, max(min(fissures.shape) / 256.0, 0.25))
    if erode_radius is None:
        erode_radius = max(int(round(2 * scale)), 1)
    if close_radius is None:
        close_radius = max(int(round(2 * scale)), 1)
    if dilate_radius is None:
        dilate_radius = max(int(round(2 * scale)), 1)
    if open_radius is None:
        open_radius = max(int(round(4 * scale)), 1)
    num_target = 4 if exclude_rhf else 5

    fis = jnp.asarray(fissures)
    if exclude_rhf:
        fis = jnp.where(fis == 3, 0, fis)
    fis_bin = fis > 0
    lung = binary_morphology(jnp.asarray(lung_mask) > 0, erode_radius, "erode")
    not_lobes = (~lung) | fis_bin
    not_lobes = binary_morphology(not_lobes, close_radius, "close")
    not_lobes = binary_morphology(not_lobes, dilate_radius, "dilate")
    lobes_mask = binary_morphology(~not_lobes, open_radius, "open")

    # host: connected components + anatomical relabelling
    comp, n = ndimage.label(np.asarray(lobes_mask))
    if n < num_target:
        return np.asarray(comp, np.int32), False
    sizes = ndimage.sum_labels(np.ones_like(comp), comp, np.arange(1, n + 1))
    keep = np.argsort(sizes)[::-1][:num_target] + 1
    centroids = np.asarray(ndimage.center_of_mass(
        np.ones_like(comp), comp, keep))  # (num_target, 3) zyx

    # smaller x is the subject's right (preproc flips into this orientation)
    sort_by_x = np.argsort(centroids[:, 2])
    num_right = 2 if exclude_rhf else 3
    right, left = sort_by_x[:num_right], sort_by_x[num_right:]
    new_label = np.zeros(num_target, np.int32)
    left_by_z = left[np.argsort(centroids[left, 0])]
    new_label[left_by_z[0]] = 3   # left lower
    new_label[left_by_z[1]] = 4   # left upper
    right_by_z = right[np.argsort(centroids[right, 0])]
    new_label[right_by_z[0]] = 1  # right lower
    new_label[right_by_z[-1]] = 2  # right upper
    if not exclude_rhf:
        new_label[right_by_z[1]] = 5  # right middle

    lobes = np.zeros(comp.shape, np.int32)
    for i, lbl in enumerate(keep):
        lobes[comp == lbl] = new_label[i]

    if fill:
        from ..postprocess.random_walk import fill_lobes
        lobes = np.asarray(fill_lobes(jnp.asarray(lobes),
                                      jnp.asarray(lung_mask) > 0,
                                      n_objects=num_target,
                                      cg_iters=cg_iters))
    return lobes.astype(np.int32), True
