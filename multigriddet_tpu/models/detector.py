"""Full MultiGridDet detector assembly + preset factories.

TPU-native counterpart of the reference's model assembly
(/root/reference/multigriddet/models/multigriddet_darknet.py:488-548 and
multigriddet_resnet.py:19-182): a flax module composing a backbone with the
MultiGrid head (which carries the implicit top-down FPN).  Presets are
registered in the model registry and instantiated by the config layer.

The forward returns raw per-scale logits ``[B, gh, gw, A_l + C + 5]`` —
decode/NMS live in ``multigriddet_tpu.ops`` and fuse into the same XLA
program when jitted together.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .darknet import CSPDarknet53, Darknet53
from .head import MultiGridHead
from .registry import get_backbone, get_head, register_model
from .resnet import ResNet50


class MultiGridDet(nn.Module):
    """backbone -> (C3, C4, C5) [-> neck] -> MultiGrid head -> (y1, y2, y3).

    ``neck`` is the composable-path slot (reference
    multigriddet_resnet.py:19-182): presets leave it None (the head carries
    the implicit FPN); ``build_custom`` may insert a registered neck that
    pre-fuses the taps.
    """

    backbone: nn.Module
    head: nn.Module
    neck: nn.Module | None = None

    def __call__(self, images: jnp.ndarray, train: bool = False,
                 backbone_train: bool | None = None):
        # ``backbone_train`` lets the freeze_level=1 transfer stage run the
        # frozen backbone in inference mode (BN normalizes with the ported
        # moving statistics and does not update them) while the head still
        # trains — the reference's Keras ``trainable=False`` semantics
        # (multigriddet_darknet.py:634-645).  Defaults to ``train``.
        bt = train if backbone_train is None else backbone_train
        # positional `train` so nn.remat's static_argnums can mark it
        taps = self.backbone(images, bt)
        if self.neck is not None:
            taps = self.neck(taps, train)
        return self.head(taps, train=train)


def _head_channels(backbone) -> Tuple[int, int, int]:
    """Head working widths: half of each tap's channel count, coarse->fine.

    For darknet taps (256,512,1024) this yields the reference's (512,256,128)
    (multigriddet_darknet.py:533-536)."""
    c3, c4, c5 = backbone.out_channels
    return c5 // 2, c4 // 2, c3 // 2


def _build(backbone_cls, num_anchors=(3, 3, 3), num_classes=80,
           use_spp=False, lite=False, dtype=jnp.float32,
           bn_axis_name=None, bn_momentum=0.99, remat=False,
           s2d_stem=None, **kwargs) -> MultiGridDet:
    bkw = dict(dtype=dtype, bn_axis_name=bn_axis_name)
    if hasattr(backbone_cls, 'bn_momentum'):
        bkw['bn_momentum'] = bn_momentum
    if s2d_stem is not None and hasattr(backbone_cls, 's2d_stem'):
        # space-to-depth early-stage rewrite (ops/s2d.py); backbones that
        # support it default to True — config `model.s2d_stem` overrides
        bkw['s2d_stem'] = s2d_stem
    if remat:
        import jax
        if remat == 'full':
            # rematerialize the whole backbone: drops ALL backbone
            # activations from HBM at the cost of one full extra forward
            # (including the expensive convs)
            backbone_cls = nn.remat(backbone_cls, static_argnums=(2,))
        else:
            # selective remat (default, remat: true|'conv'): save each
            # conv's output (named in layers.py::ConvBN) and recompute
            # only the cheap BN+activation elementwise chain backward —
            # drops ~2/3 of the residuals without re-running any conv
            policy = jax.checkpoint_policies.save_only_these_names(
                'conv_out')
            backbone_cls = nn.remat(backbone_cls, static_argnums=(2,),
                                    policy=policy)
    backbone = backbone_cls(**bkw)
    head = MultiGridHead(
        num_anchors=tuple(num_anchors), num_classes=num_classes,
        channels=_head_channels(backbone), use_spp=use_spp, lite=lite,
        dtype=dtype, bn_axis_name=bn_axis_name, bn_momentum=bn_momentum)
    return MultiGridDet(backbone=backbone, head=head)


@register_model('multigriddet_darknet')
def multigriddet_darknet(**kwargs) -> MultiGridDet:
    return _build(Darknet53, **kwargs)


@register_model('multigriddet_darknet_spp')
def multigriddet_darknet_spp(**kwargs) -> MultiGridDet:
    return _build(Darknet53, use_spp=True, **kwargs)


@register_model('multigriddet_darknet_lite')
def multigriddet_darknet_lite(**kwargs) -> MultiGridDet:
    return _build(Darknet53, lite=True, **kwargs)


@register_model('multigriddet_csp_darknet')
def multigriddet_csp_darknet(**kwargs) -> MultiGridDet:
    return _build(CSPDarknet53, **kwargs)


@register_model('multigriddet_darknet_panet')
def multigriddet_darknet_panet(num_anchors=(3, 3, 3), num_classes=80,
                               dtype=jnp.float32, bn_axis_name=None,
                               bn_momentum=0.99, s2d_stem=None,
                               **kwargs) -> MultiGridDet:
    """CSPDarknet53 + PANet head (YOLOv4-style paths, compact predicts)."""
    from .head import PANetHead
    backbone = CSPDarknet53(dtype=dtype, bn_axis_name=bn_axis_name,
                            bn_momentum=bn_momentum,
                            **({} if s2d_stem is None
                               else {'s2d_stem': s2d_stem}))
    head = PANetHead(num_anchors=tuple(num_anchors),
                     num_classes=num_classes,
                     channels=_head_channels(backbone), dtype=dtype,
                     bn_axis_name=bn_axis_name, bn_momentum=bn_momentum)
    return MultiGridDet(backbone=backbone, head=head)


@register_model('multigriddet_resnet')
def multigriddet_resnet(**kwargs) -> MultiGridDet:
    return _build(ResNet50, **kwargs)


@register_model('multigriddet_mobile')
def multigriddet_mobile(**kwargs) -> MultiGridDet:
    """Depthwise-separable backbone + lite head: the edge/latency preset."""
    from .darknet import MobileDarknet
    return _build(MobileDarknet, lite=True, **kwargs)


class TinyBackbone(nn.Module):
    """Minimal 5-stride backbone for smoke tests and CI (not in reference)."""

    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    bn_momentum: float = 0.99
    out_channels: Tuple[int, int, int] = (32, 48, 64)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import ConvBN
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  bn_momentum=self.bn_momentum)
        taps = []
        for i, ch in enumerate((16, 24, *self.out_channels)):
            x = ConvBN(ch, 3, strides=2, **kw)(x, train)
            if i >= 2:
                taps.append(x)
        return tuple(taps)


@register_model('multigriddet_tiny')
def multigriddet_tiny(**kwargs) -> MultiGridDet:
    return _build(TinyBackbone, **kwargs)


def build_custom(backbone_name: str, head_name: str = 'multigrid',
                 neck_name: str | None = None, num_anchors=(3, 3, 3),
                 num_classes=80, dtype=jnp.float32, bn_axis_name=None,
                 neck_kwargs=None, **head_kwargs) -> MultiGridDet:
    """Compose a detector from registered components (custom config mode).

    Mirrors the reference's registry composition (registry.py:266-305 +
    multigriddet_resnet.py:19-182): an optional registered neck pre-fuses
    the backbone taps before the head; the head's working widths are then
    derived from the neck's output channels instead of the backbone's.
    """
    from .registry import get_neck
    backbone_cls = get_backbone(backbone_name)
    head_cls = get_head(head_name)
    backbone = backbone_cls(dtype=dtype, bn_axis_name=bn_axis_name)
    neck = None
    channels = _head_channels(backbone)
    if neck_name and neck_name != 'none':
        neck_cls = get_neck(neck_name)
        neck = neck_cls(dtype=dtype, bn_axis_name=bn_axis_name,
                        **(neck_kwargs or {}))
        fine, mid, coarse = neck.out_channels
        if coarse < 0:    # pass-through slot: backbone's C5 width
            coarse = backbone.out_channels[2]
        channels = (coarse // 2, mid // 2, fine // 2)
    head = head_cls(
        num_anchors=tuple(num_anchors), num_classes=num_classes,
        channels=channels, dtype=dtype,
        bn_axis_name=bn_axis_name, **head_kwargs)
    return MultiGridDet(backbone=backbone, neck=neck, head=head)
