"""Utility layer: anchors, classes, visualization, profiling."""

from .profiling import PhaseTimer, trace
from .anchors import (DEFAULT_COCO_ANCHORS, class_counts_from_annotations,
                      compute_class_weights, load_anchors, load_classes)
from .visualization import draw_boxes, get_colors

__all__ = [
    'DEFAULT_COCO_ANCHORS', 'class_counts_from_annotations',
    'compute_class_weights', 'load_anchors', 'load_classes',
    'PhaseTimer', 'trace', 'draw_boxes', 'get_colors',
]
