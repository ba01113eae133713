"""MultiGridDet-TPU loss library."""

from .focal import (binary_cross_entropy_with_logits, sigmoid_focal_loss,
                    softmax_focal_loss)
from .iou import diou, giou, iou_cxcywh, iou_family_loss
from .multigrid_loss import LossConfig, multigrid_loss, multigrid_loss_jit

__all__ = [
    'LossConfig', 'multigrid_loss', 'multigrid_loss_jit',
    'binary_cross_entropy_with_logits',
    'sigmoid_focal_loss', 'softmax_focal_loss', 'diou', 'giou', 'iou_cxcywh',
    'iou_family_loss',
]
