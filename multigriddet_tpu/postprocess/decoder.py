"""MultiGridDecoder: reference-API-compatible postprocess facade.

Mirrors the reference decoder's public surface
(/root/reference/multigriddet/postprocess/multigrid_decode.py:17-422:
``postprocess(predictions, image_shape) -> (boxes, classes, scores)``)
while executing the decode + confidence filter + NMS on device through the
jitted ops.  Output boxes are ``(x1, y1, x2, y2)`` in original-image
pixels, clipped — the reference's final convention.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.decode import decode_predictions
from ..ops.geometry import canvas_boxes_to_image
from ..ops.nms import batched_nms
from .wbf import fuse_and_cap


class MultiGridDecoder:

    def __init__(self, anchors: Sequence[np.ndarray], num_classes: int,
                 input_hw: Tuple[int, int] = (608, 608),
                 confidence: float = 0.1, nms_threshold: float = 0.45,
                 nms_method: str = 'diou', use_iol: bool = True,
                 use_wbf: bool = False, max_boxes: int = 100,
                 wbf_mode: str = 'paper'):
        self.anchors = [np.asarray(a, np.float32) for a in anchors]
        self.num_classes = num_classes
        self.input_hw = tuple(input_hw)
        self.confidence = confidence
        self.nms_threshold = nms_threshold
        self.nms_method = nms_method
        self.use_iol = use_iol
        self.use_wbf = use_wbf
        self.wbf_mode = wbf_mode
        self.max_boxes = max_boxes
        self._decode_nms = jax.jit(self._build())

    def _build(self):
        anchors = self.anchors
        hw = self.input_hw
        scale = jnp.asarray([hw[1], hw[0], hw[1], hw[0]], jnp.float32)

        def fn(preds):
            dec = decode_predictions(list(preds), anchors, hw)
            xy, wh = dec[..., 0:2], dec[..., 2:4]
            tl = jnp.concatenate([xy - wh / 2.0, wh], axis=-1) * scale
            scores = dec[..., 4]
            classes = jnp.argmax(dec[..., 5:], axis=-1)
            if self.use_wbf:
                # WBF fuses on host; return the confidence-filtered set
                return tl, classes, scores, scores >= self.confidence
            return batched_nms(
                tl, scores, classes, self.confidence, self.nms_threshold,
                max_boxes=self.max_boxes, nms_method=self.nms_method,
                use_iol=self.use_iol)
        return fn

    def postprocess(self, predictions: Sequence[np.ndarray],
                    image_shape: Optional[Tuple[int, int]] = None):
        """Decode one image's raw per-scale outputs to final detections.

        Args:
          predictions: per-scale ``[1, gh, gw, 5+A+C]`` arrays.
          image_shape: original (height, width); defaults to the canvas.

        Returns (boxes ``[N, 4]`` xyxy pixels, classes ``[N]``,
        scores ``[N]``).
        """
        preds = [jnp.asarray(p) for p in predictions]
        tl, classes, scores, valid = self._decode_nms(preds)
        tl = np.asarray(tl[0])
        classes = np.asarray(classes[0])
        scores = np.asarray(scores[0])
        keep = np.asarray(valid[0])
        tl, classes, scores = tl[keep], classes[keep], scores[keep]
        if self.use_wbf:
            tl, classes, scores = fuse_and_cap(
                tl, classes, scores, iou_thr=self.nms_threshold,
                mode=self.wbf_mode, max_out=self.max_boxes)
        ih, iw = image_shape or self.input_hw
        if len(tl):
            # host numpy path: canvas_boxes_to_image combines the
            # normalized-cxcywh convert, letterbox inverse, and bounds
            # clip without a per-image device dispatch (geometry._xp)
            xywh = np.asarray(canvas_boxes_to_image(
                tl, (ih, iw), self.input_hw))
            boxes = np.stack([xywh[:, 0], xywh[:, 1],
                              xywh[:, 0] + xywh[:, 2],
                              xywh[:, 1] + xywh[:, 3]], axis=-1)
        else:
            boxes = np.zeros((0, 4), np.float32)
        return boxes, classes, scores
