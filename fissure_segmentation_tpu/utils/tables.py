"""Result aggregation: CSV -> dataframe / LaTeX tables, pareto plots.

Counterpart of reference thesis/tables.py (`csv_to_df:27`, ±-tables `:75`)
and performance_time_plot.py:30-40 (runtime-vs-ASSD pareto scatter).
"""
from __future__ import annotations

import csv
import os
from glob import glob

import numpy as np


def read_results_csv(path: str) -> dict[str, list[float]]:
    """Parse a write_results CSV into {row_name: [per-class..., mean]}."""
    out = {}
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0] in ("Class", "Fissure"):
                continue
            try:
                out[row[0]] = [float(v) for v in row[1:]]
            except ValueError:
                continue
    return out


def collect_cv_results(experiment_dir: str, filename: str = "test_results.csv"):
    """Aggregate per-fold result CSVs (mean over folds per metric row)."""
    folds = sorted(glob(os.path.join(experiment_dir, "fold*", "test",
                                     filename))) or \
        sorted(glob(os.path.join(experiment_dir, "fold*", filename)))
    per_fold = [read_results_csv(f) for f in folds]
    if not per_fold:
        return {}
    keys = per_fold[0].keys()
    return {k: np.nanmean([np.asarray(p[k], float) for p in per_fold if k in p],
                          axis=0).tolist() for k in keys}


def pm_table(means: dict, stds: dict, metrics=("Dice", "ASSD", "HD95"),
             precision: int = 2) -> list[list[str]]:
    """mean ± std table rows (thesis/tables.py:75 format)."""
    rows = [["metric"] + [f"class {i}" for i in
                          range(len(next(iter(means.values()))))]]
    for m in metrics:
        mk, sk = f"Mean {m}", f"StdDev {m}"
        if mk not in means:
            continue
        rows.append([m] + [f"{mu:.{precision}f} ± {sd:.{precision}f}"
                           for mu, sd in zip(means[mk], stds.get(sk, means[mk]))])
    return rows


def to_latex(rows: list[list[str]]) -> str:
    """Minimal LaTeX tabular (thesis/tables.py csv->latex path)."""
    ncol = len(rows[0])
    lines = ["\\begin{tabular}{" + "l" * ncol + "}", "\\toprule",
             " & ".join(rows[0]) + " \\\\", "\\midrule"]
    for r in rows[1:]:
        lines.append(" & ".join(str(c) for c in r) + " \\\\")
    lines += ["\\bottomrule", "\\end{tabular}"]
    return "\n".join(lines)


def performance_time_plot(entries: list[dict], path: str,
                          baseline_entries: list[dict] | None = None):
    """Runtime-vs-ASSD pareto scatter (performance_time_plot.py:30-40).

    :param entries: [{'label', 'runtime_s', 'assd_mm'}, ...]
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(7, 5))
    for e in entries:
        ax.scatter(e["runtime_s"], e["assd_mm"], marker="o", s=60)
        ax.annotate(e["label"], (e["runtime_s"], e["assd_mm"]),
                    textcoords="offset points", xytext=(6, 4), fontsize=8)
    for e in baseline_entries or []:
        ax.scatter(e["runtime_s"], e["assd_mm"], marker="x", s=60, c="gray")
        ax.annotate(e["label"], (e["runtime_s"], e["assd_mm"]),
                    textcoords="offset points", xytext=(6, 4), fontsize=8,
                    color="gray")
    ax.set_xscale("log")
    ax.set_xlabel("runtime per case [s]")
    ax.set_ylabel("mean ASSD [mm]")
    ax.grid(alpha=0.3)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
