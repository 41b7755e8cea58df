"""Dataset preparation pipelines.

Counterparts of the reference's preprocessing entry points:
  `preprocess_totalsegmentator_case`
      (preprocess_totalsegmentator_dataset.py:144-222): z-crop around the
      lobe labels, flip into canonical orientation, clamp HU, derive
      fissures + lung mask from the lobe GT.
  `create_case_meshes` (preprocess_totalsegmentator_dataset.py:225-262):
      ground-truth surface meshes per fissure/lobe via surface fitting.
  `label_pipeline_case` (label_preprocessing_pipeline.py:17-52): the 4-step
      per-case chain — Poisson label regularization, lung masking, lobe
      generation, keypoint extraction.
  `save_meshes` (utils/general_utils.py 'save_meshes' layout):
      `{case}_mesh_{seq}/{case}_{name}{i}_{seq}.obj`.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..postprocess.surface_fitting import poisson_reconstruction
from ..utils.image_ops import apply_mask
from ..utils.objio import save_obj
from .labels import (find_fissures, find_lobes, find_non_zero_range,
                     generate_lung_mask, label_to_mesh)

IMG_MIN, IMG_MAX = -1000.0, 1500.0  # HU clamp range (constants.py:8-9)

# Cases whose 5 lobes are present but cut off somewhere — the v1 script's
# manually-curated exclusion set (preprocess_totalsegmentator_dataset_v1.py:28)
EXCLUDE_LIST_V1 = (57, 58, 67, 135, 165, 199, 212, 215, 256, 264, 266, 294,
                   321, 428, 509, 542, 555, 566, 607, 651, 682, 705, 743,
                   762, 806, 864, 965, 1179, 1257, 1261, 1268, 1307, 1367,
                   1386)


def preprocess_totalsegmentator_case(img: np.ndarray, lobes: np.ndarray,
                                     z_pad: int = 15, flip_xy: bool = True,
                                     legacy_v1: bool = False):
    """One TotalSegmentator case -> cropped/canonical image + GT labels.

    :param img: (D, H, W) CT volume in HU
    :param lobes: (D, H, W) combined lobe labelmap (1 RLL, 2 RUL, 3 LLL,
        4 LUL, 5 RML)
    :param legacy_v1: reproduce the v1 crops consumed by the reference's
        qualitative figures (preprocess_totalsegmentator_dataset_v1.py:
        z_pad 20, no binary opening of the lobe z-range, no HU clamp); the
        fissure/lung-mask derivation is identical between versions
    :return: dict with image, lobes, fissures, lung_mask arrays
    """
    img = np.asarray(img)
    lobes = np.asarray(lobes)
    if legacy_v1:
        z_pad = 20
    lo, hi = find_non_zero_range(lobes, axis=0,
                                 open_radius=0 if legacy_v1 else 2)
    lo = max(lo - z_pad, 0)
    hi = min(hi + z_pad, lobes.shape[0])
    img, lobes = img[lo:hi], lobes[lo:hi]

    if flip_xy:  # direction (-1,0,0, 0,-1,0, 0,0,1) -> canonical (preproc:202)
        img = img[:, ::-1, ::-1].copy()
        lobes = lobes[:, ::-1, ::-1].copy()

    if not legacy_v1:  # the v1 script wrote unclamped HU volumes
        img = np.clip(img, IMG_MIN - 1, IMG_MAX)
    lobes_j = jnp.asarray(lobes)
    fissures = np.asarray(find_fissures(lobes_j))
    lung_mask = np.asarray(generate_lung_mask(lobes_j))
    return {"image": img.astype(np.float32), "lobes": lobes.astype(np.int32),
            "fissures": fissures.astype(np.uint8), "lung_mask": lung_mask}


def save_meshes(meshes, folder: str, case: str, sequence: str,
                obj_name: str = "fissure") -> list[str]:
    """Write (tris, valid) triangle soups as OBJ files in the reference's
    `{case}_mesh_{seq}/` layout."""
    mesh_dir = os.path.join(folder, f"{case}_mesh_{sequence}")
    os.makedirs(mesh_dir, exist_ok=True)
    paths = []
    for i, (tris, valid) in enumerate(meshes):
        t = np.asarray(tris)[np.asarray(valid)]
        verts = t.reshape(-1, 3)
        faces = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
        p = os.path.join(mesh_dir, f"{case}_{obj_name}{i + 1}_{sequence}.obj")
        save_obj(p, verts, faces)
        paths.append(p)
    return paths


def create_case_meshes(fissures: np.ndarray, lobes: np.ndarray,
                       lung_mask: np.ndarray, spacing=(1.0, 1.0, 1.0),
                       **fit_kwargs):
    """GT mesh creation (preprocess_totalsegmentator_dataset.py:225-262):
    fissure meshes by Poisson surface fitting, lobe meshes by marching the
    labelmap. Returns (fissure_meshes, lobe_meshes) as (tris, valid) lists."""
    _, fissure_meshes = poisson_reconstruction(fissures, lung_mask,
                                               spacing=spacing, **fit_kwargs)
    lobe_meshes = []
    for lbl in sorted(int(l) for l in np.unique(lobes) if l != 0):
        tris, valid = label_to_mesh(lobes, lbl, mask=None)
        lobe_meshes.append((np.asarray(tris), np.asarray(valid)))
    return fissure_meshes, lobe_meshes


def label_pipeline_case(img: np.ndarray, fissures: np.ndarray,
                        lung_mask: np.ndarray, out_dir: str, case: str,
                        sequence: str, exclude_rhf: bool = True,
                        kp_mode: str = "foerstner", compute_points: bool = True,
                        spacing=(1.0, 1.0, 1.0),
                        cnn_model_path: str | None = None,
                        feature_mode: str | None = None,
                        **fit_kwargs) -> dict:
    """The reference's 4-step per-case label pipeline
    (label_preprocessing_pipeline.py:17-52):
      1. Poisson regularization of the fissure labels (+ GT meshes),
      2. lung masking of the regularized labels,
      3. lobe generation from the fissures,
      4. keypoint + feature extraction.
    Writes meshes/point files under `out_dir` and returns the artifacts.

    :param cnn_model_path: for kp_mode='cnn': a trained seg-CNN checkpoint
        (.fst) whose single-pass full-volume softmax supplies the candidate
        map (reference keypoint_extraction.py:53-131 loads the MobileNetASPP
        fold model and runs the sliding window).
    """
    import jax

    # 1. surface fitting
    regularized, fissure_meshes = poisson_reconstruction(
        fissures, lung_mask, spacing=spacing, **fit_kwargs)
    save_meshes(fissure_meshes, out_dir, case, sequence, obj_name="fissure")

    # 2. lung masking
    regularized = np.asarray(apply_mask(jnp.asarray(regularized),
                                        jnp.asarray(lung_mask)))

    # 3. lobe generation
    lobes, success = find_lobes(jnp.asarray(regularized),
                                jnp.asarray(lung_mask),
                                exclude_rhf=exclude_rhf)
    out = {"fissures_regularized": regularized, "fissure_meshes": fissure_meshes,
           "lobes": lobes, "lobes_success": success}
    if not success:
        return out
    lobe_meshes = [label_to_mesh(lobes, l) for l in
                   sorted(int(x) for x in np.unique(lobes) if x)]
    lobe_meshes = [(np.asarray(t), np.asarray(v)) for t, v in lobe_meshes]
    save_meshes(lobe_meshes, out_dir, case, sequence, obj_name="lobe")
    out["lobe_meshes"] = lobe_meshes

    # 4. keypoints + features
    if compute_points:
        from ..keypoints.extraction import compute_keypoints
        cnn_softmax = None
        if kp_mode == "cnn":
            if cnn_model_path is None:
                raise ValueError(
                    "kp_mode='cnn' needs cnn_model_path (a trained seg-CNN "
                    ".fst checkpoint, e.g. <seg_cnn_dir>/fold0/model.fst)")
            from ..models import load_model, predict_full_volume
            module, variables = load_model(cnn_model_path)
            cnn_softmax = predict_full_volume(
                module.apply, variables, jnp.asarray(img, jnp.float32),
                dtype=jnp.bfloat16)
        out["points"] = compute_keypoints(
            jax.random.PRNGKey(0), img, regularized, lung_mask,
            kp_mode=kp_mode, lobes=lobes, case_id=case, sequence=sequence,
            cnn_softmax=cnn_softmax, feature_mode=feature_mode)
    return out
