"""End-to-end test pipeline + result CSV writers.

Counterpart of reference train.py:179-346 (`test`) and the writers at
train.py:427-483: per case — ensembled full-cloud prediction, per-class
point extraction, Poisson (spectral PSR) surface fit with lung-half
component filtering, label Dice + mesh distance metrics (ASSD/SDSD/HD/HD95),
NaN rows for failed fissures instead of aborting (train.py:294-297) —
aggregated to mean/std CSVs.

GT surfaces come from the dataset: each case may carry dense GT surface
samples per fissure label under ``gt_surfaces`` (dict label -> (M, 3) world
xyz points), e.g. produced by data/synthetic.gt_surface_points or loaded
from reference mesh files.
"""
from __future__ import annotations

import csv
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import PointDataset
from ..metrics import batch_dice, mesh_metrics_from_point_sets
from ..models.ensemble import ensemble_predict
from ..ops.marching import sample_points_on_triangles
from ..postprocess.surface_fitting import pointcloud_surface_fitting
from ..utils.coords import kpts_to_world


def binary_to_fissure_labels(pred_binary: np.ndarray, pts_idx_zyx: np.ndarray,
                             lung_lr: np.ndarray) -> np.ndarray:
    """Binary fissure prediction -> left/right fissure labels via the
    left(1)/right(2) lung mask (utils/fissure_utils.py:8-29, point-level):
    points outside the lung are discarded (label 0).

    :param pred_binary: (N,) 0/1 predictions
    :param pts_idx_zyx: (N, 3) int voxel indices into lung_lr
    :param lung_lr: (D, H, W) 0 background / 1 left / 2 right
    """
    idx = np.clip(pts_idx_zyx, 0, np.asarray(lung_lr.shape) - 1)
    lr = np.asarray(lung_lr)[idx[:, 0], idx[:, 1], idx[:, 2]]
    return np.where(np.asarray(pred_binary) > 0, lr, 0).astype(np.int32)


def lobe_points_to_fissure_labels(pred_lobes: np.ndarray,
                                  pts_idx_zyx: np.ndarray,
                                  lung_mask: np.ndarray,
                                  cg_iters: int = 300):
    """Sparse lobe point predictions -> per-point fissure labels
    (train.py:230-247): voxelize the point labels as random-walk seeds,
    fill the lung (postprocess.random_walk.lobes_to_fissures), then read
    the resulting fissure map back at the points.

    :return: (pred_fissure_labels (N,), fissure_map (D, H, W))
    """
    from ..postprocess.random_walk import lobes_to_fissures
    shape = np.asarray(lung_mask).shape
    sparse = np.zeros(shape, np.int32)
    idx = np.clip(pts_idx_zyx, 0, np.asarray(shape) - 1)
    sparse[idx[:, 0], idx[:, 1], idx[:, 2]] = np.asarray(pred_lobes)
    fis, _ = lobes_to_fissures(jnp.asarray(sparse),
                               jnp.asarray(np.asarray(lung_mask, bool)),
                               cg_iters=cg_iters)
    fis = np.asarray(fis)
    return fis[idx[:, 0], idx[:, 1], idx[:, 2]].astype(np.int32), fis


def evaluate_case(pred_labels: np.ndarray, coords_grid: np.ndarray, case: dict,
                  num_classes: int, grid_res=(64, 64, 64),
                  n_metric_samples: int = 4000, seed: int = 42):
    """Post-process one case: per-fissure surface fit + mesh metrics.

    :return: dict with 'assd', 'sdsd', 'hd', 'hd95' arrays (num_classes-1,)
        (NaN where reconstruction failed) and 'missing' bool array.
    """
    shape = case["shape"]
    n_f = num_classes - 1
    out = {k: np.full(n_f, np.nan) for k in ("assd", "sdsd", "hd", "hd95")}
    out["missing"] = np.ones(n_f, bool)
    out["meshes"] = [None] * n_f   # fitted (tris, valid) per fissure class
    gt_surfaces = case.get("gt_surfaces")
    for c in range(1, num_classes):
        pts = coords_grid[pred_labels == c]
        if pts.shape[0] < 4:
            continue  # NaN row (reference train.py:294-297)
        pts_world = np.asarray(kpts_to_world(jnp.asarray(pts), shape))
        try:
            tris, valid = pointcloud_surface_fitting(
                pts_world, shape, grid_res=grid_res, right=c > 1,
                center_x=shape[2] / 2)
        except ValueError:
            continue
        if not valid.any():
            continue
        out["missing"][c - 1] = False
        out["meshes"][c - 1] = (np.asarray(tris), np.asarray(valid))
        if gt_surfaces is None or c not in gt_surfaces:
            continue
        pred_samples = np.asarray(sample_points_on_triangles(
            jax.random.PRNGKey(seed + c), jnp.asarray(tris), jnp.asarray(valid),
            n_metric_samples))
        gt = np.asarray(gt_surfaces[c])
        assd, sdsd, hd, hd95 = mesh_metrics_from_point_sets(
            jnp.asarray(pred_samples), jnp.asarray(gt, dtype=jnp.float32))
        out["assd"][c - 1] = float(assd)
        out["sdsd"][c - 1] = float(sdsd)
        out["hd"][c - 1] = float(hd)
        out["hd95"][c - 1] = float(hd95)
    return out


def _export_case_artifacts(case_id: str, coords_grid: np.ndarray,
                           pred: np.ndarray, targ: np.ndarray, meshes,
                           case: dict, mesh_dir: str, label_dir: str,
                           plot_dir: str, show: bool = False) -> None:
    """Per-case test artifacts (reference train.py:195-321): predicted
    fissure meshes as OBJ, voxelized predicted labelmap as NIfTI, and
    predicted/target point-cloud scatter PNGs."""
    from ..postprocess.surface_fitting import mesh_to_labelmap
    from ..utils.nifti import save_nifti
    from ..utils.objio import save_obj
    from ..utils.visualization import plot_point_cloud

    shape = case["shape"]
    world = np.asarray(kpts_to_world(jnp.asarray(coords_grid), shape))
    plot_point_cloud(world, pred, title=f"{case_id} point cloud prediction",
                     show=show,
                     path=os.path.join(plot_dir,
                                       f"{case_id}_point_cloud_pred.png"))
    plot_point_cloud(world, targ, title=f"{case_id} point cloud target",
                     show=show,
                     path=os.path.join(plot_dir,
                                       f"{case_id}_point_cloud_targ.png"))

    present = []
    for c, m in enumerate(meshes, start=1):
        if m is None:
            present.append((np.zeros((0, 3, 3), np.float32),
                            np.zeros((0,), bool)))
            continue
        tris, valid = m
        t = tris[valid]
        verts = t.reshape(-1, 3)
        faces = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
        save_obj(os.path.join(mesh_dir, f"{case_id}_fissure{c}_pred.obj"),
                 verts, faces)
        present.append((tris, valid))

    labelmap = mesh_to_labelmap(present, shape)
    save_nifti(os.path.join(label_dir, f"{case_id}_fissures_pred.nii.gz"),
               labelmap.astype(np.uint8),
               spacing=tuple(case.get("spacing", (1.0, 1.0, 1.0))))

    # interactive 3-D scene (Open3D draw_geometries replacement,
    # reference visualization.py:5-16): one offline HTML/WebGL viewer with
    # the predicted meshes and the labeled keypoint cloud
    from ..utils.mesh_viewer import export_mesh_viewer
    export_mesh_viewer(present,
                       os.path.join(plot_dir, f"{case_id}_viewer.html"),
                       points=world, point_labels=pred,
                       title=f"{case_id} predicted fissures")


def test_pipeline(ds: PointDataset, apply_fn, variables, out_dir: str,
                  sample_points: int = 2048, n_runs_min: int = 50,
                  grid_res=(64, 64, 64), seed: int = 42, show: bool = False,
                  label_space: str = "fissures",
                  export_artifacts: bool = True, copd: bool = False):
    """Full test harness over a dataset (train.py:179-346).

    :param label_space: prediction label semantics —
        "fissures" (default), "lobes" (convert to fissures via the
        random-walk fill, train.py:230-247; cases must carry a
        ``lung_mask`` volume) or "binary" (left/right relabel via the
        ``lung_lr`` volume, train.py:252-260 + fissure_utils.py:8).
    :param show: display the per-case point-cloud plots interactively in
        addition to saving them (reference train.py `show`)
    :param export_artifacts: write per-case artifacts under
        ``out_dir/test_predictions/`` — predicted fissure meshes (OBJ,
        meshes/), the mesh-voxelized predicted labelmap (NIfTI,
        labelmaps/) and predicted/target point-cloud plots (PNG, plots/)
        — mirroring reference train.py:195-321.
    :return: dict of per-class aggregate metric arrays
    """
    os.makedirs(out_dir, exist_ok=True)
    if export_artifacts:
        pred_dir = os.path.join(out_dir, "test_predictions")
        mesh_dir = os.path.join(pred_dir, "meshes")
        label_dir = os.path.join(pred_dir, "labelmaps")
        plot_dir = os.path.join(pred_dir, "plots")
        for d in (mesh_dir, label_dir, plot_dir):
            os.makedirs(d, exist_ok=True)
    if label_space == "fissures":
        num_classes = ds.num_classes
    elif label_space == "binary":
        num_classes = 3                      # bg / left / right
    else:  # lobes: 5 lobes -> 3 fissures, 4 lobes (exclude_rhf) -> 2
        num_classes = 4 if ds.num_classes >= 6 else 3
    rng = jax.random.PRNGKey(seed)

    dices, per_case, ids = [], [], []
    inference_times, post_times = [], []
    for i in range(len(ds)):
        x, y = ds.get_full_pointcloud(i)
        rng, r = jax.random.split(rng)
        t0 = time.time()
        probs = ensemble_predict(apply_fn, variables, jnp.asarray(x), r,
                                 sample_points=min(sample_points, x.shape[0]),
                                 n_runs_min=n_runs_min)
        argmax = jnp.argmax(probs, axis=-1)
        jax.block_until_ready(argmax)          # compute only ...
        inference_times.append(time.time() - t0)
        pred = np.asarray(argmax)              # ... transfer not timed

        if label_space != "fissures":
            case = ds.cases[i]
            shape = case["shape"]
            world = np.asarray(kpts_to_world(jnp.asarray(x[:, :3]), shape))
            idx_zyx = np.round(world[:, ::-1]).astype(int)
            # Predictions are now in fissure label space — GT must be too,
            # or dice compares fissure ids against lobe/binary ids and is
            # silently garbage. gt_surfaces must likewise be fissure-keyed.
            gt_key = ("fissure_labels_lr" if label_space == "binary"
                      else "fissure_labels")
            if gt_key not in case:
                raise KeyError(
                    f"label_space={label_space!r} evaluation needs fissure-"
                    f"space GT labels (case key {gt_key!r}); the original "
                    f"{label_space} labels cannot be compared against the "
                    f"converted predictions")
            if label_space == "binary":
                pred = binary_to_fissure_labels(pred, idx_zyx,
                                                case["lung_lr"])
            else:  # lobes
                pred, _ = lobe_points_to_fissure_labels(
                    pred, idx_zyx, case["lung_mask"])
            y = np.asarray(case[gt_key])

        dices.append(np.asarray(batch_dice(jnp.asarray(pred)[None],
                                           jnp.asarray(y)[None], num_classes)))
        t0 = time.time()
        per_case.append(evaluate_case(pred, x[:, :3], ds.cases[i], num_classes,
                                      grid_res=grid_res, seed=seed))
        post_times.append(time.time() - t0)
        case_id = "_".join(str(s) for s in ds.ids[i])
        ids.append(case_id)

        if export_artifacts:
            _export_case_artifacts(
                case_id, np.asarray(x[:, :3]), pred, np.asarray(y),
                per_case[-1]["meshes"], ds.cases[i], mesh_dir, label_dir,
                plot_dir, show=show)

    dices = np.stack(dices)
    metrics = {}
    for k in ("assd", "sdsd", "hd", "hd95"):
        metrics[k] = np.stack([c[k] for c in per_case])
    missing = np.stack([c["missing"] for c in per_case])

    mean = lambda a: np.nanmean(a, axis=0)
    # ddof=1: the reference's nanstd wraps torch.std, which is the UNBIASED
    # estimator (general_utils.py:359-370); numpy defaults to ddof=0
    std = lambda a: np.nanstd(a, axis=0, ddof=1)
    suffix = "_copd" if copd else ""          # reference train.py:342,176
    write_results(os.path.join(out_dir, f"test_results{suffix}.csv"),
                  dices.mean(0), dices.std(0, ddof=1),
                  mean(metrics["assd"]), std(metrics["assd"]),
                  mean(metrics["sdsd"]), std(metrics["sdsd"]),
                  mean(metrics["hd"]), std(metrics["hd"]),
                  mean(metrics["hd95"]), std(metrics["hd95"]),
                  missing.mean(0))
    write_raw_results_per_instance(out_dir, ids=ids, copd=copd,
                                   dice=dices[:, 1:], assd=metrics["assd"])
    write_speed_results(out_dir, inference_times, post_times, suffix=suffix)
    return {"dice": dices.mean(0), "assd": mean(metrics["assd"]),
            "sdsd": mean(metrics["sdsd"]), "hd": mean(metrics["hd"]),
            "hd95": mean(metrics["hd95"]), "missing": missing.mean(0)}


def write_results(filepath, mean_dice, std_dice, mean_assd, std_assd,
                  mean_sdsd, std_sdsd, mean_hd, std_hd, mean_hd95, std_hd95,
                  proportion_missing=None, **additional_metrics):
    """(train.py:451-483 format parity)"""
    def row(name, arr):
        arr = np.atleast_1d(np.asarray(arr, np.float64))
        return [name] + [float(v) for v in arr] + [float(np.nanmean(arr))]

    with open(filepath, "w") as f:
        w = csv.writer(f)
        if mean_dice is not None:
            w.writerow(["Class"] + [str(i) for i in range(len(mean_dice))] + ["mean"])
            w.writerow(row("Mean Dice", mean_dice))
            w.writerow(row("StdDev Dice", std_dice))
            w.writerow([])
        w.writerow(["Fissure"] + [str(i + 1) for i in range(len(mean_assd))] + ["mean"])
        w.writerow(row("Mean ASSD", mean_assd))
        w.writerow(row("StdDev ASSD", std_assd))
        w.writerow(row("Mean SDSD", mean_sdsd))
        w.writerow(row("StdDev SDSD", std_sdsd))
        w.writerow(row("Mean HD", mean_hd))
        w.writerow(row("StdDev HD", std_hd))
        w.writerow(row("Mean HD95", mean_hd95))
        w.writerow(row("StdDev HD95", std_hd95))
        if proportion_missing is None:
            proportion_missing = np.zeros_like(np.asarray(mean_assd))
        w.writerow(row("proportion missing", proportion_missing))
        for key, value in additional_metrics.items():
            arr = np.atleast_1d(np.asarray(value))
            w.writerow([key] + [float(v) for v in arr])


def write_raw_results_per_instance(out_folder, ids=None, copd=False, **metrics):
    """(train.py:150-177 format parity, without the pandas dependency)"""
    for name, values in metrics.items():
        values = np.asarray(values)
        path = os.path.join(out_folder,
                            f"{name}_per_instance{'_copd' if copd else ''}.csv")
        with open(path, "w") as f:
            w = csv.writer(f)
            w.writerow(["ID"] + [f"fissure {i + 1}" for i in range(values.shape[1])]
                       + ["mean"])
            for r, vid in enumerate(ids or range(values.shape[0])):
                w.writerow([vid] + [float(v) for v in values[r]]
                           + [float(np.nanmean(values[r]))])


def write_speed_results(out_dir, all_inference_times, all_post_proc_times=None,
                        points_per_fissure=None, suffix=""):
    """(train.py:427-448 format parity). `suffix` (e.g. "_copd") keeps
    transfer-validation timings from overwriting the in-distribution
    inference_time.csv in the shared fold test dir."""
    inf = np.asarray(all_inference_times, np.float64)
    post = np.asarray(all_post_proc_times, np.float64) \
        if all_post_proc_times is not None else np.zeros_like(inf)
    total = inf + post
    header = ["Inference", "Inference_std", "Post-Processing",
              "Post-Processing_std", "Total", "Total_std"]
    ddof = 1 if len(inf) > 1 else 0  # torch.std parity (train.py:427-448)
    row = [inf.mean(), inf.std(ddof=ddof), post.mean(), post.std(ddof=ddof),
           total.mean(), total.std(ddof=ddof)]
    if points_per_fissure is not None:
        ppf = np.asarray(points_per_fissure, np.float64)
        header += ["Points_per_Fissure", "Points_per_Fissure_std"]
        row += [ppf.mean(), ppf.std(0, ddof=1 if len(ppf) > 1 else 0).mean()]
    with open(os.path.join(out_dir, f"inference_time{suffix}.csv"), "w") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerow([float(v) for v in row])
