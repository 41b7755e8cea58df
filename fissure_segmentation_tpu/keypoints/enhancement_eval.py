"""Quality evaluation of the Hessian fissure-enhancement filter.

Counterpart of reference data_processing/fissure_enhancement.py:223-310
(`fissure_candidates`, `threshold_curves`): ROC-AUC / average precision of
the enhancement image against GT fissure voxels (per fissure label, all, and
all-but-RHF), plus Dice/recall/accuracy over a threshold sweep with an
optional metrics-per-threshold plot.
"""
from __future__ import annotations

import os

import numpy as np


def threshold_curves(pred_values: np.ndarray, labels: np.ndarray,
                     out_dir: str | None = None, show: bool = False):
    """ROC-AUC + average precision per label group
    (fissure_enhancement.py:265-310).

    :param pred_values: (D, H, W) enhancement image (higher = more fissure)
    :param labels: (D, H, W) int GT fissure labels
    :return: (roc_auc dict, avg_prec dict) keyed by label int, 'all',
        'all_but_RHF'
    """
    from sklearn.metrics import average_precision_score, roc_auc_score

    labels = np.asarray(labels).ravel()
    pred = np.asarray(pred_values, np.float64).ravel()
    groups = [int(l) for l in np.unique(labels) if l != 0]
    groups += ["all", "all_but_RHF"]

    roc_auc, avg_prec, curves = {}, {}, {}
    for lbl in groups:
        if lbl == "all":
            gt = labels != 0
        elif lbl == "all_but_RHF":
            gt = (labels != 0) & (labels != 3)
        else:
            gt = labels == lbl
        if not gt.any() or gt.all():
            continue
        roc_auc[lbl] = float(roc_auc_score(gt, pred))
        avg_prec[lbl] = float(average_precision_score(gt, pred))
        if out_dir is not None or show:
            from sklearn.metrics import roc_curve
            fpr, tpr, _ = roc_curve(gt, pred)
            # decimate for plotting (full curves have ~1e7 points)
            step = max(1, len(fpr) // 2000)
            curves[lbl] = (fpr[::step], tpr[::step])

    if out_dir is not None or show:
        from ..utils.visualization import _plt
        plt = _plt()
        fig, ax = plt.subplots()
        for lbl, (fpr, tpr) in curves.items():
            ax.plot(fpr, tpr, label=f"{lbl} (AUC={roc_auc[lbl]:.3f})")
        ax.plot([0, 1], [0, 1], "k--", lw=0.5)
        ax.set_xlabel("false positive rate")
        ax.set_ylabel("true positive rate")
        ax.legend()
        if out_dir is not None:
            os.makedirs(out_dir, exist_ok=True)
            fig.savefig(os.path.join(out_dir, "roc.png"), dpi=300)
        if show:  # pragma: no cover - interactive
            plt.show()
        plt.close(fig)
    return roc_auc, avg_prec


def fissure_candidates(enhanced: np.ndarray, gt_fissures: np.ndarray,
                       fixed_thresh: float | None = None, show: bool = False,
                       img_dir: str | None = None, img_prefix: str = ""):
    """Threshold sweep of the enhancement image
    (fissure_enhancement.py:223-262): per threshold t the prediction is
    `enhanced > t`; reports foreground Dice, recall and accuracy, and the
    ROC/AP summary from `threshold_curves`.

    :return: (roc_auc, avg_prec, thresholds (T,), dice (T,), recall (T,),
        accuracy (T,))
    """
    enhanced = np.asarray(enhanced)
    gt_bin = np.asarray(gt_fissures) != 0
    roc_auc, avg_prec = threshold_curves(enhanced, np.asarray(gt_fissures),
                                         out_dir=img_dir, show=show)

    thresholds = (np.linspace(0.0, 1.0, 21) if fixed_thresh is None
                  else np.asarray([fixed_thresh]))
    n_gt = gt_bin.sum()
    n_vox = gt_bin.size
    dices, recalls, accs = [], [], []
    for t in thresholds:
        pred = enhanced > t
        tp = np.count_nonzero(pred & gt_bin)
        n_pred = np.count_nonzero(pred)
        dices.append(2.0 * tp / max(n_pred + n_gt, 1))
        recalls.append(tp / max(n_gt, 1))
        accs.append(1.0 - (n_pred + n_gt - 2 * tp) / n_vox)

    if img_dir is not None or show:
        from ..utils.visualization import _plt
        plt = _plt()
        fig, ax = plt.subplots()
        ax.plot(thresholds, recalls, label="recall")
        ax.plot(thresholds, dices, label="dice")
        ax.plot(thresholds, accs, label="accuracy")
        ax.set_title("thresholding fissure-enhanced image")
        ax.set_xlabel("threshold")
        ax.legend()
        if img_dir is not None:
            os.makedirs(img_dir, exist_ok=True)
            fig.savefig(os.path.join(
                img_dir, f"{img_prefix}metrics_per_threshold.png"),
                dpi=300, bbox_inches="tight")
        if show:  # pragma: no cover - interactive
            plt.show()
        plt.close(fig)

    return (roc_auc, avg_prec, thresholds, np.asarray(dices),
            np.asarray(recalls), np.asarray(accs))
