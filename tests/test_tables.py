"""Result-aggregation / reporting layer (thesis/tables.py counterpart)."""
import csv
import os

import numpy as np

from fissure_segmentation_tpu.utils.tables import (
    collect_experiment_grid, comparative_bar_plot, copd_comparison_table,
    pm_table, performance_time_plot, seg_table, to_latex)


def _write_results_csv(path, dice=0.8, assd=2.0, missing=0.0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = [["Class", "1", "2", "3", "mean"]]
    for name, v in (("Mean Dice", dice), ("StdDev Dice", 0.05),
                    ("Mean ASSD", assd), ("StdDev ASSD", 0.5),
                    ("Mean SDSD", assd / 2), ("StdDev SDSD", 0.2),
                    ("Mean HD", assd * 4), ("StdDev HD", 1.0),
                    ("Mean HD95", assd * 3), ("StdDev HD95", 0.8),
                    ("proportion missing", missing)):
        rows.append([name] + [f"{v:.4f}"] * 4)
    with open(path, "w") as f:
        csv.writer(f).writerows(rows)


def _make_grid(root, experiments, copd=False, **kw):
    for exp in experiments:
        for fold in range(2):
            _write_results_csv(
                os.path.join(root, exp, f"fold{fold}", "test",
                             f"test_results{'_copd' if copd else ''}.csv"),
                **kw)


def test_experiment_grid_and_seg_table(tmp_path):
    root = str(tmp_path / "DGCNN_seg")
    _make_grid(root, ["foerstner_image", "cnn_nofeat"], dice=0.85, assd=1.5)
    grid = collect_experiment_grid(root)
    assert set(grid) == {"foerstner_image", "cnn_nofeat"}
    assert np.allclose(grid["foerstner_image"]["Mean Dice"], 0.85)

    rows = seg_table(root)
    assert rows[0][0] == "experiment"
    assert len(rows) == 3
    assert any("1.50 ±" in c for c in rows[1])
    latex = to_latex(rows)
    assert "\\begin{tabular}" in latex and "foerstner\\_image" not in latex


def test_copd_comparison_table(tmp_path):
    root = str(tmp_path / "DGCNN_seg")
    _make_grid(root, ["foerstner_image"], dice=0.8, assd=2.0)
    _make_grid(root, ["foerstner_image"], copd=True, dice=0.6, assd=3.0)
    rows = copd_comparison_table(root)
    assert rows[1][0] == "foerstner_image"
    # dice 0.8 -> 0.6 is -25%
    assert rows[1][1] == "0.80" and rows[1][2] == "0.60"
    assert rows[1][3] == "-25.0"
    # assd 2 -> 3 is +50%
    assert rows[1][6] == "+50.0"


def test_comparative_bar_plot_and_pareto(tmp_path):
    r1 = str(tmp_path / "DGCNN_seg")
    r2 = str(tmp_path / "PointNet_seg")
    _make_grid(r1, ["foerstner_image"], assd=1.5)
    _make_grid(r2, ["foerstner_image"], assd=2.5)
    out = str(tmp_path / "bars.png")
    comparative_bar_plot({"DGCNN": r1, "PointNet": r2}, out)
    assert os.path.exists(out)

    out2 = str(tmp_path / "pareto.png")
    performance_time_plot(
        [{"label": "ours", "runtime_s": 0.8, "assd_mm": 3.5}], out2,
        baseline_entries=[{"label": "ref", "runtime_s": 1.35, "assd_mm": 3.5}])
    assert os.path.exists(out2)


def test_pm_table_format():
    means = {"Mean Dice": [0.8, 0.9], "Mean ASSD": [1.0, 2.0]}
    stds = {"StdDev Dice": [0.1, 0.1], "StdDev ASSD": [0.2, 0.3]}
    rows = pm_table(means, stds, metrics=("Dice", "ASSD"))
    assert rows[1][1] == "0.80 ± 0.10"
    assert rows[2][2] == "2.00 ± 0.30"


def test_visualization_extras(tmp_path):
    """visualize_with_overlay / plot_normals / Bremm 2-D colors
    (visualization.py:78-326 counterparts)."""
    from fissure_segmentation_tpu.utils.visualization import (
        color_2d_mesh_bremm, color_2d_points_bremm, plot_normals,
        visualize_with_overlay)

    img = np.random.rand(32, 32)
    seg = np.zeros((32, 32), np.int32)
    seg[8:16, 8:16] = 1
    visualize_with_overlay(img, seg, path=str(tmp_path / "ov.png"))
    assert (tmp_path / "ov.png").exists()

    coords = np.random.rand(20, 3)
    normals = np.random.randn(20, 3)
    plot_normals(coords, normals, path=str(tmp_path / "nrm.png"))
    assert (tmp_path / "nrm.png").exists()

    # Lab anchors: a=b=0 is achromatic (r=g=b); +a is redder than -a
    pts = np.array([[0.5, 0.5], [1.0, 0.5], [0.0, 0.5],
                    [0.5, 0.0], [0.5, 1.0]])
    c = color_2d_points_bremm(pts)
    assert np.allclose(c[0], c[0][0], atol=0.02)     # center -> gray
    assert c[1][0] > c[2][0]                         # +a redder
    tri = color_2d_mesh_bremm(np.random.rand(9, 2),
                              np.array([[0, 1, 2], [3, 4, 5]]))
    assert tri.shape == (2, 3)


def test_mesh_viewer_export(tmp_path):
    """export_mesh_viewer writes one self-contained HTML file embedding the
    valid triangles and labeled point layers (the interactive Open3D
    draw_geometries replacement, reference visualization.py:5-16)."""
    import base64

    from fissure_segmentation_tpu.utils.mesh_viewer import export_mesh_viewer

    rng = np.random.default_rng(0)
    tris = rng.uniform(0, 10, (8, 3, 3)).astype(np.float32)
    valid = np.array([True] * 6 + [False] * 2)
    pts = rng.uniform(0, 10, (20, 3)).astype(np.float32)
    labels = np.array([0] * 5 + [1] * 10 + [2] * 5)

    path = export_mesh_viewer(
        [(tris, valid), (tris[:0], valid[:0])],
        str(tmp_path / "v.html"), points=pts, point_labels=labels,
        title="case x")
    html = open(path).read()
    assert html.startswith("<!DOCTYPE html>") and "</html>" in html
    assert "case x" in html and "webgl" in html
    # no external resources: fully offline
    assert "http://" not in html and "https://" not in html
    # layer 0 embeds exactly the 6 valid triangles (54 floats)
    import json as _json
    data = _json.loads(html.split("const DATA = ")[1].split(";\n")[0])
    v0 = np.frombuffer(base64.b64decode(data["layers"][0]["v"]), np.float32)
    np.testing.assert_allclose(v0, tris[valid].reshape(-1), rtol=1e-6)
    # 3 point layers (labels 0/1/2) after the 2 mesh layers
    assert len(data["layers"]) == 5
    kinds = [l["kind"] for l in data["layers"]]
    assert kinds == ["mesh", "mesh", "points", "points", "points"]
