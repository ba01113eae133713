from .decode import (decode_for_nms, decode_predictions,
                     decode_scale, decode_scale_for_nms,
                     invert_xy_activation, xy_activation)
from .encoding import (encode_targets, encode_targets_np,
                       extract_center_gt_boxes, flatten_anchors,
                       match_anchors)
from .geometry import (canvas_boxes_to_image, clip_boxes_xywh,
                       cxcywh_to_xyxy, iol_wh, iou_wh,
                       pairwise_diou_xywh_topleft, pairwise_iou_cxcywh,
                       pairwise_iou_xywh_topleft, undo_letterbox_boxes,
                       xyxy_to_cxcywh)
from .nms import batched_nms

__all__ = [
    'decode_for_nms', 'decode_predictions', 'decode_scale',
    'decode_scale_for_nms', 'invert_xy_activation', 'xy_activation',
    'encode_targets', 'encode_targets_np', 'extract_center_gt_boxes',
    'flatten_anchors', 'match_anchors',
    'canvas_boxes_to_image', 'clip_boxes_xywh',
    'cxcywh_to_xyxy', 'iol_wh', 'iou_wh', 'pairwise_diou_xywh_topleft',
    'pairwise_iou_cxcywh', 'pairwise_iou_xywh_topleft',
    'undo_letterbox_boxes', 'xyxy_to_cxcywh', 'batched_nms',
]
