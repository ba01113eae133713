"""Weighted Boxes Fusion (host NumPy).

Behavioral port of /root/reference/multigriddet/postprocess/wbf.py:11-290:
per-class clustering of boxes at ``iou_thr`` with confidence-weighted
coordinate averaging — an alternative to NMS for ensembles.  Box format:
top-left ``(x, y, w, h)``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..evaluation.metrics import iou_matrix


def weighted_boxes_fusion(boxes: np.ndarray, scores: np.ndarray,
                          classes: np.ndarray, iou_thr: float = 0.55,
                          score_thr: float = 0.0,
                          conf_type: str = 'avg'
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fuse overlapping same-class boxes.

    Args:
      boxes: ``[N, 4]`` top-left xywh.
      scores: ``[N]``.
      classes: ``[N]`` int.
      conf_type: 'avg' (mean of cluster scores) or 'max'.

    Returns (fused_boxes, fused_scores, fused_classes) sorted by score.
    """
    keep = scores >= score_thr
    boxes, scores, classes = boxes[keep], scores[keep], classes[keep]
    out_boxes, out_scores, out_classes = [], [], []
    for c in np.unique(classes):
        sel = classes == c
        b, s = boxes[sel], scores[sel]
        order = np.argsort(-s, kind='stable')
        b, s = b[order], s[order]
        clusters: list[list[int]] = []
        reps: list[np.ndarray] = []
        for i in range(len(b)):
            placed = False
            for ci, rep in enumerate(reps):
                if iou_matrix(b[i:i + 1], rep[None])[0, 0] >= iou_thr:
                    clusters[ci].append(i)
                    idx = clusters[ci]
                    w = s[idx]
                    reps[ci] = (b[idx] * w[:, None]).sum(0) / w.sum()
                    placed = True
                    break
            if not placed:
                clusters.append([i])
                reps.append(b[i].copy())
        for ci, idx in enumerate(clusters):
            w = s[idx]
            fused = (b[idx] * w[:, None]).sum(0) / w.sum()
            score = float(w.max() if conf_type == 'max' else w.mean())
            # reference down-weights small clusters relative to the
            # typical ensemble size of 1 model: keep the plain score here
            out_boxes.append(fused)
            out_scores.append(score)
            out_classes.append(int(c))
    if not out_boxes:
        return (np.zeros((0, 4), np.float32), np.zeros((0,), np.float32),
                np.zeros((0,), np.int32))
    out_boxes = np.stack(out_boxes).astype(np.float32)
    out_scores = np.asarray(out_scores, np.float32)
    out_classes = np.asarray(out_classes, np.int32)
    order = np.argsort(-out_scores, kind='stable')
    return out_boxes[order], out_scores[order], out_classes[order]
