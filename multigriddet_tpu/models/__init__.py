"""MultiGridDet-TPU model zoo (flax, NHWC, bfloat16-capable)."""

from . import registry as _registry  # noqa: F401
from .darknet import CSPDarknet53, Darknet53
from .detector import (MultiGridDet, build_custom, multigriddet_csp_darknet,
                       multigriddet_darknet, multigriddet_darknet_lite,
                       multigriddet_darknet_spp, multigriddet_resnet)
from .head import MultiGridHead, MultiGridLiteHead
from .layers import ConvBN, PredictConv, SeparableConvBN, mish, spp, upsample2x
from .neck import MultiGridFPN
from .registry import (create_model, get_backbone, get_head, get_neck,
                       list_available_models, list_components,
                       register_backbone, register_head, register_model,
                       register_neck)
from .resnet import ResNet, ResNet50, ResNet101

__all__ = [
    'CSPDarknet53', 'Darknet53', 'MultiGridDet', 'MultiGridFPN',
    'MultiGridHead',
    'MultiGridLiteHead', 'ResNet', 'ResNet50', 'ResNet101', 'ConvBN',
    'PredictConv', 'SeparableConvBN', 'mish', 'spp', 'upsample2x',
    'build_custom', 'create_model', 'get_backbone', 'get_head', 'get_neck',
    'list_available_models', 'list_components', 'multigriddet_csp_darknet', 'multigriddet_darknet',
    'multigriddet_darknet_lite', 'multigriddet_darknet_spp',
    'multigriddet_resnet', 'register_backbone', 'register_head',
    'register_model', 'register_neck',
]
