"""Box and anchor geometry primitives (pure JAX, shape-polymorphic, vmap-able).

TPU-native re-implementation of the geometry math used throughout the
reference framework (see /root/reference/multigriddet/utils/anchors.py:18-90,
/root/reference/multigriddet/data/generators.py:2486-2494 and
/root/reference/multigriddet/losses/iou_losses.py).  Everything here is a pure
function over fixed-shape arrays so it fuses into surrounding XLA programs.

Conventions
-----------
* ``wh`` pairs are ``(w, h)``.
* ``cxcywh`` boxes are ``(center_x, center_y, w, h)``.
* ``xyxy`` boxes are ``(x1, y1, x2, y2)`` with ``x2 >= x1``.
* All functions broadcast over leading dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

EPS = 1e-8


# ---------------------------------------------------------------------------
# (w, h) anchor matching metrics — boxes and anchors share an implied center.
# ---------------------------------------------------------------------------

def iol_wh(boxes_wh: jnp.ndarray, anchors_wh: jnp.ndarray) -> jnp.ndarray:
    """Intersection-over-Largest between (w,h) boxes and anchors.

    IoL = intersection_area / max(box_area, anchor_area), assuming a common
    center.  This is MultiGridDet's anchor-matching metric (reference:
    multigriddet/data/generators.py:2486-2494).

    Args:
      boxes_wh: ``[..., N, 2]`` box (w, h).
      anchors_wh: ``[M, 2]`` anchor (w, h).

    Returns:
      ``[..., N, M]`` IoL scores.
    """
    b = boxes_wh[..., :, None, :]        # [..., N, 1, 2]
    a = anchors_wh[None, :, :]           # [1, M, 2]
    inter = jnp.minimum(b, a)
    inter_area = inter[..., 0] * inter[..., 1]
    box_area = boxes_wh[..., :, None, 0] * boxes_wh[..., :, None, 1]
    anchor_area = anchors_wh[None, :, 0] * anchors_wh[None, :, 1]
    largest = jnp.maximum(box_area, anchor_area)
    return inter_area / (largest + EPS)


def iou_wh(boxes_wh: jnp.ndarray, anchors_wh: jnp.ndarray) -> jnp.ndarray:
    """Classic IoU between (w,h) boxes and anchors with a shared center."""
    b = boxes_wh[..., :, None, :]
    a = anchors_wh[None, :, :]
    inter = jnp.minimum(b, a)
    inter_area = inter[..., 0] * inter[..., 1]
    box_area = boxes_wh[..., :, None, 0] * boxes_wh[..., :, None, 1]
    anchor_area = anchors_wh[None, :, 0] * anchors_wh[None, :, 1]
    union = box_area + anchor_area - inter_area
    return inter_area / (union + EPS)


# ---------------------------------------------------------------------------
# Full-box overlap metrics.
# ---------------------------------------------------------------------------

def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    xy, wh = boxes[..., 0:2], boxes[..., 2:4]
    half = wh / 2.0
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    mins, maxs = boxes[..., 0:2], boxes[..., 2:4]
    return jnp.concatenate([(mins + maxs) / 2.0, maxs - mins], axis=-1)


def pairwise_iou_cxcywh(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between two sets of center-format boxes.

    Args:
      boxes1: ``[..., N, 4]`` cxcywh.
      boxes2: ``[..., M, 4]`` cxcywh.

    Returns:
      ``[..., N, M]`` IoU (mirrors reference multigrid_loss.py:445-492).
    """
    b1 = cxcywh_to_xyxy(boxes1)[..., :, None, :]   # [..., N, 1, 4]
    b2 = cxcywh_to_xyxy(boxes2)[..., None, :, :]   # [..., 1, M, 4]
    inter_min = jnp.maximum(b1[..., 0:2], b2[..., 0:2])
    inter_max = jnp.minimum(b1[..., 2:4], b2[..., 2:4])
    inter_wh = jnp.maximum(inter_max - inter_min, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    area1 = (boxes1[..., 2] * boxes1[..., 3])[..., :, None]
    area2 = (boxes2[..., 2] * boxes2[..., 3])[..., None, :]
    union = area1 + area2 - inter
    return inter / (union + EPS)


def pairwise_iou_xywh_topleft(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                              use_iol: bool = False) -> jnp.ndarray:
    """Pairwise IoU (or IoL) for boxes in top-left ``(x, y, w, h)`` format.

    Matches the NMS-stage metric of the reference (postprocess/nms.py:41-148):
    ``use_iol=True`` divides intersection by the larger of the two areas.
    """
    x1, y1 = boxes1[..., :, None, 0], boxes1[..., :, None, 1]
    w1, h1 = boxes1[..., :, None, 2], boxes1[..., :, None, 3]
    x2, y2 = boxes2[..., None, :, 0], boxes2[..., None, :, 1]
    w2, h2 = boxes2[..., None, :, 2], boxes2[..., None, :, 3]
    inter_w = jnp.maximum(
        0.0, jnp.minimum(x1 + w1, x2 + w2) - jnp.maximum(x1, x2))
    inter_h = jnp.maximum(
        0.0, jnp.minimum(y1 + h1, y2 + h2) - jnp.maximum(y1, y2))
    inter = inter_w * inter_h
    a1, a2 = w1 * h1, w2 * h2
    if use_iol:
        return inter / (jnp.maximum(a1, a2) + EPS)
    return inter / (a1 + a2 - inter + EPS)


def pairwise_diou_xywh_topleft(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                               use_iol: bool = False) -> jnp.ndarray:
    """Pairwise DIoU for top-left (x,y,w,h) boxes (reference nms.py:189-240).

    DIoU = IoU - center_distance^2 / enclosing_diagonal^2.
    """
    iou = pairwise_iou_xywh_topleft(boxes1, boxes2, use_iol=use_iol)
    c1x = boxes1[..., :, None, 0] + boxes1[..., :, None, 2] / 2.0
    c1y = boxes1[..., :, None, 1] + boxes1[..., :, None, 3] / 2.0
    c2x = boxes2[..., None, :, 0] + boxes2[..., None, :, 2] / 2.0
    c2y = boxes2[..., None, :, 1] + boxes2[..., None, :, 3] / 2.0
    center_dist = (c1x - c2x) ** 2 + (c1y - c2y) ** 2
    enc_xmin = jnp.minimum(boxes1[..., :, None, 0], boxes2[..., None, :, 0])
    enc_ymin = jnp.minimum(boxes1[..., :, None, 1], boxes2[..., None, :, 1])
    enc_xmax = jnp.maximum(boxes1[..., :, None, 0] + boxes1[..., :, None, 2],
                           boxes2[..., None, :, 0] + boxes2[..., None, :, 2])
    enc_ymax = jnp.maximum(boxes1[..., :, None, 1] + boxes1[..., :, None, 3],
                           boxes2[..., None, :, 1] + boxes2[..., None, :, 3])
    diag = (enc_xmax - enc_xmin) ** 2 + (enc_ymax - enc_ymin) ** 2
    return iou - center_dist / (diag + EPS)


# ---------------------------------------------------------------------------
# Letterbox coordinate transforms.
# ---------------------------------------------------------------------------

def _xp(*arrays):
    """numpy for host arrays, jnp for device/traced arrays.

    The letterbox-inverse family below runs per image on tiny (<=100 box)
    arrays AFTER the fused device program; dispatching those as eager jnp
    ops costs a device round-trip per call (~30 ms/image through a
    tunneled TPU — measured to dominate file-serving throughput).  The
    math is identical in both namespaces; jit-traced inputs still take
    the jnp path.
    """
    return jnp if any(isinstance(a, jnp.ndarray) for a in arrays) else np


def undo_letterbox_boxes(boxes_cxcywh_norm, image_hw, model_hw):
    """Invert the letterbox transform on decoded boxes.

    Maps boxes normalized to the model canvas back to absolute pixel coords of
    the original image, returning top-left ``(x, y, w, h)`` boxes.  Mirrors
    the reference ``MultiGridDecoder.correct_boxes``
    (postprocess/multigrid_decode.py:185-235).

    Args:
      boxes_cxcywh_norm: ``[..., 4]`` (cx, cy, w, h) in [0,1] model space.
      image_hw: original image (height, width), python or traced scalars.
      model_hw: model input (height, width).
    """
    xp = _xp(boxes_cxcywh_norm, image_hw)
    box_xy = boxes_cxcywh_norm[..., 0:2]
    box_wh = boxes_cxcywh_norm[..., 2:4]
    image_hw = xp.asarray(image_hw, xp.float32)
    model_hw = xp.asarray(model_hw, xp.float32)
    new_shape = xp.round(image_hw * xp.min(model_hw / image_hw))
    offset_hw = (model_hw - new_shape) / 2.0 / model_hw
    scale_hw = model_hw / new_shape
    offset = offset_hw[::-1]   # (x, y)
    scale = scale_hw[::-1]
    box_xy = (box_xy - offset) * scale
    box_wh = box_wh * scale
    box_xy = box_xy - box_wh / 2.0   # top-left corner
    image_wh = image_hw[::-1]
    return xp.concatenate([box_xy * image_wh, box_wh * image_wh], axis=-1)


def clip_boxes_xywh(boxes_xywh, image_hw):
    """Clip top-left ``(x, y, w, h)`` boxes to the image rectangle.

    Matches the reference decoder's final clamp to ``[0, w] x [0, h]``
    (postprocess/multigrid_decode.py:397-422): both corners are clipped and
    width/height recomputed, so boxes straddling an edge shrink instead of
    sliding inward.
    """
    xp = _xp(boxes_xywh, image_hw)
    image_hw = xp.asarray(image_hw, xp.float32)
    x1 = xp.clip(boxes_xywh[..., 0], 0.0, image_hw[1])
    y1 = xp.clip(boxes_xywh[..., 1], 0.0, image_hw[0])
    x2 = xp.clip(boxes_xywh[..., 0] + boxes_xywh[..., 2], 0.0, image_hw[1])
    y2 = xp.clip(boxes_xywh[..., 1] + boxes_xywh[..., 3], 0.0, image_hw[0])
    return xp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)


def canvas_boxes_to_image(boxes_xywh, image_hw, model_hw,
                          clip: bool = True):
    """Top-left xywh boxes in letterbox-canvas pixels -> original image pixels.

    Combines the normalized-cxcywh conversion, the letterbox inverse
    (``undo_letterbox_boxes``), and the reference's final bounds clip
    (postprocess/multigrid_decode.py:185-235, 397-422) into the one transform
    the inference/evaluation paths need after fused on-device NMS.
    Host (numpy) inputs stay on host — no device dispatch per image.
    """
    xp = _xp(boxes_xywh)
    boxes = xp.asarray(boxes_xywh, xp.float32)
    model_wh = xp.asarray(model_hw, xp.float32)[::-1]
    cxcy = (boxes[..., 0:2] + boxes[..., 2:4] / 2.0) / model_wh
    wh = boxes[..., 2:4] / model_wh
    out = undo_letterbox_boxes(xp.concatenate([cxcy, wh], axis=-1),
                               image_hw, model_hw)
    if clip:
        out = clip_boxes_xywh(out, image_hw)
    return out
