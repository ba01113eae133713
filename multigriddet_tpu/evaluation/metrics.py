"""Custom COCO-style mAP (no pycocotools), vectorized NumPy.

Behavioral re-implementation of the reference's evaluation metrics
(/root/reference/multigriddet/evaluation/metrics.py:28-865): vectorized IoU
matrices, greedy confidence-ordered matching, PR curves with COCO all-point
or VOC 11-point interpolation, per-class AP over an IoU-threshold grid,
small/medium/large breakdowns at the 32^2 / 96^2 COCO area splits, and a
formatted results printer.

Boxes everywhere are top-left ``(x, y, w, h)`` in original-image pixels.
Predictions: dict image_id -> {'boxes': [N,4], 'classes': [N],
'scores': [N]}.  Ground truth: dict image_id -> {'boxes': [M,4],
'classes': [M]}.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

COCO_IOU_THRESHOLDS = tuple(np.arange(0.5, 1.0, 0.05).round(2))
AREA_RANGES = {
    'small': (0.0, 32.0 ** 2),
    'medium': (32.0 ** 2, 96.0 ** 2),
    'large': (96.0 ** 2, float('inf')),
}


def iou_matrix(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise IoU of top-left xywh boxes: [N, M]
    (reference metrics.py:28-70)."""
    if len(boxes1) == 0 or len(boxes2) == 0:
        return np.zeros((len(boxes1), len(boxes2)), np.float32)
    x11, y11 = boxes1[:, 0:1], boxes1[:, 1:2]
    x12, y12 = x11 + boxes1[:, 2:3], y11 + boxes1[:, 3:4]
    x21, y21 = boxes2[None, :, 0], boxes2[None, :, 1]
    x22, y22 = x21 + boxes2[None, :, 2], y21 + boxes2[None, :, 3]
    iw = np.maximum(0.0, np.minimum(x12, x22) - np.maximum(x11, x21))
    ih = np.maximum(0.0, np.minimum(y12, y22) - np.maximum(y11, y21))
    inter = iw * ih
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    return (inter / np.maximum(a1 + a2 - inter, 1e-9)).astype(np.float32)


def match_detections(pred_boxes, pred_scores, gt_boxes,
                     iou_threshold: float) -> np.ndarray:
    """Greedy confidence-ordered matching (reference metrics.py:73-218).

    Returns a bool TP flag per prediction (sorted by the caller's order).
    """
    n, m = len(pred_boxes), len(gt_boxes)
    tp = np.zeros(n, bool)
    if n == 0 or m == 0:
        return tp
    ious = iou_matrix(pred_boxes, gt_boxes)
    taken = np.zeros(m, bool)
    order = np.argsort(-pred_scores, kind='stable')
    for i in order:
        j = int(np.argmax(np.where(taken, -1.0, ious[i])))
        if ious[i, j] >= iou_threshold and not taken[j]:
            tp[i] = True
            taken[j] = True
    return tp


def average_precision(recalls: np.ndarray, precisions: np.ndarray,
                      method: str = 'coco') -> float:
    """COCO all-point or VOC 11-point AP (reference metrics.py:221-304)."""
    if method == 'voc':
        ap = 0.0
        for t in np.linspace(0.0, 1.0, 11):
            mask = recalls >= t
            ap += (precisions[mask].max() if mask.any() else 0.0) / 11.0
        return float(ap)
    mrec = np.concatenate([[0.0], recalls, [1.0]])
    mpre = np.concatenate([[0.0], precisions, [0.0]])
    mpre = np.maximum.accumulate(mpre[::-1])[::-1]
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def _class_pr(predictions: Dict, ground_truths: Dict, class_id: int,
              iou_threshold: float, area_range=None):
    """Per-class TP flags + PR curve over all images."""
    all_scores, all_tp = [], []
    n_gt = 0
    for img_id, gt in ground_truths.items():
        gmask = gt['classes'] == class_id
        g_boxes = gt['boxes'][gmask]
        if area_range is not None:
            areas = g_boxes[:, 2] * g_boxes[:, 3]
            in_range = (areas >= area_range[0]) & (areas < area_range[1])
        else:
            in_range = np.ones(len(g_boxes), bool)
        n_gt += int(in_range.sum())
        pred = predictions.get(img_id)
        if pred is None or len(pred['boxes']) == 0:
            continue
        pmask = pred['classes'] == class_id
        p_boxes, p_scores = pred['boxes'][pmask], pred['scores'][pmask]
        if area_range is not None:
            p_areas = p_boxes[:, 2] * p_boxes[:, 3]
            p_in = (p_areas >= area_range[0]) & (p_areas < area_range[1])
            p_boxes, p_scores = p_boxes[p_in], p_scores[p_in]
        tp = match_detections(p_boxes, p_scores, g_boxes[in_range],
                              iou_threshold)
        all_scores.append(p_scores)
        all_tp.append(tp)
    if not all_scores:
        return None, n_gt
    scores = np.concatenate(all_scores)
    tp = np.concatenate(all_tp)
    order = np.argsort(-scores, kind='stable')
    tp = tp[order]
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(~tp)
    recalls = cum_tp / max(n_gt, 1)
    precisions = cum_tp / np.maximum(cum_tp + cum_fp, 1)
    return (recalls, precisions, scores[order], tp), n_gt


def calculate_map(predictions: Dict, ground_truths: Dict,
                  num_classes: int,
                  iou_thresholds: Sequence[float] = COCO_IOU_THRESHOLDS,
                  interpolation_method: str = 'coco',
                  optimize_classes: bool = True,
                  class_names: Optional[Sequence[str]] = None,
                  compute_size_breakdown: bool = True,
                  use_parallel: bool = False) -> Dict:
    """Full mAP computation (reference calculate_map, metrics.py:529-814).

    ``use_parallel`` fans the per-(class, threshold) AP tasks over a thread
    pool (NumPy releases the GIL in the heavy kernels) — the counterpart of
    the reference's multiprocessing Pool (metrics.py:596-647) without the
    pickling cost.

    Returns a dict with mAP, mAP50, mAP75, per_class_ap, APS/APM/APL,
    per-class PR curves at IoU 0.5.
    """
    active = set()
    if optimize_classes:
        for gt in ground_truths.values():
            active.update(np.unique(gt['classes']).tolist())
        for p in predictions.values():
            active.update(np.unique(p['classes']).tolist())
    else:
        active = set(range(num_classes))

    ap_grid = np.zeros((num_classes, len(iou_thresholds)), np.float64)
    gt_counts = np.zeros(num_classes, np.int64)
    pr_curves = {}

    def one_task(c, ti, thr):
        pr, n_gt = _class_pr(predictions, ground_truths, c, thr)
        ap = 0.0
        curve = None
        if pr is not None and n_gt > 0:
            recalls, precisions, _, _ = pr
            ap = average_precision(recalls, precisions,
                                   interpolation_method)
            if abs(thr - 0.5) < 1e-6:
                curve = (recalls, precisions)
        return c, ti, thr, n_gt, ap, curve

    tasks = [(c, ti, thr) for c in sorted(active) if c < num_classes
             for ti, thr in enumerate(iou_thresholds)]
    if use_parallel and len(tasks) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=8) as pool:
            results_iter = list(pool.map(lambda t: one_task(*t), tasks))
    else:
        results_iter = [one_task(*t) for t in tasks]
    for c, ti, thr, n_gt, ap, curve in results_iter:
        if ti == 0:
            gt_counts[c] = n_gt
        ap_grid[c, ti] = ap
        if curve is not None:
            pr_curves[c] = curve

    valid = gt_counts > 0
    results: Dict = {
        'per_class_ap': {},
        'gt_counts': gt_counts,
        'pr_curves': pr_curves,
        'iou_thresholds': list(iou_thresholds),
    }
    names = class_names or [str(i) for i in range(num_classes)]
    for c in range(num_classes):
        if valid[c]:
            results['per_class_ap'][names[c]] = {
                'ap': float(ap_grid[c].mean()),
                'ap50': float(ap_grid[c, 0]),
                'count': int(gt_counts[c]),
            }
    if valid.any():
        results['mAP'] = float(ap_grid[valid].mean())
        results['mAP50'] = float(ap_grid[valid, 0].mean())
        i75 = (np.abs(np.asarray(iou_thresholds) - 0.75) < 1e-6).nonzero()[0]
        results['mAP75'] = (float(ap_grid[valid, i75[0]].mean())
                            if len(i75) else float('nan'))
    else:
        results['mAP'] = results['mAP50'] = results['mAP75'] = 0.0

    if compute_size_breakdown:
        for size_name, rng in AREA_RANGES.items():
            aps = []
            for c in range(num_classes):
                if c not in active:
                    continue
                per_thr = []
                for thr in iou_thresholds:
                    pr, n_gt = _class_pr(predictions, ground_truths, c, thr,
                                         area_range=rng)
                    if pr is None or n_gt == 0:
                        continue
                    recalls, precisions, _, _ = pr
                    per_thr.append(average_precision(
                        recalls, precisions, interpolation_method))
                if per_thr:
                    aps.append(np.mean(per_thr))
            results[f'mAP_{size_name}'] = (float(np.mean(aps)) if aps
                                           else 0.0)
    return results


def format_results(results: Dict, top_k: int = 20) -> str:
    """Formatted results table (reference metrics.py:817-865)."""
    lines = ['=' * 64,
             f"mAP@0.5:0.95 = {results.get('mAP', 0):.4f}   "
             f"mAP@0.5 = {results.get('mAP50', 0):.4f}   "
             f"mAP@0.75 = {results.get('mAP75', 0):.4f}"]
    for size in ('small', 'medium', 'large'):
        key = f'mAP_{size}'
        if key in results:
            lines.append(f'  AP-{size[0].upper()} = {results[key]:.4f}')
    lines.append('-' * 64)
    per_class = sorted(results.get('per_class_ap', {}).items(),
                       key=lambda kv: -kv[1]['ap'])
    lines.append(f'{"class":<28}{"AP":>8}{"AP50":>8}{"#gt":>8}')
    for name, info in per_class[:top_k]:
        lines.append(f'{name:<28}{info["ap"]:>8.4f}{info["ap50"]:>8.4f}'
                     f'{info["count"]:>8d}')
    if len(per_class) > top_k:
        lines.append(f'... {len(per_class) - top_k} more classes')
    lines.append('=' * 64)
    return '\n'.join(lines)
