"""Data pipeline: annotations, host loading, on-device augmentation."""

from . import augment
from .annotations import (HostImageLoader, letterbox_image,
                          load_and_letterbox, load_annotation_lines,
                          parse_annotation_line)
from .pipeline import (MULTISCALE_SHAPES, MultiGridDataGenerator,
                       calculate_expansion_factor)

__all__ = [
    'augment', 'HostImageLoader', 'letterbox_image', 'load_and_letterbox',
    'load_annotation_lines', 'parse_annotation_line', 'MULTISCALE_SHAPES',
    'MultiGridDataGenerator', 'calculate_expansion_factor',
]
