"""MultiGrid detection head with implicit top-down FPN.

Re-implements the reference head (/root/reference/multigriddet/models/
layers.py:122-257 and models/heads/multigrid_head.py): per scale a 3-conv
bottleneck then a single predict conv with ``A + C + 5`` output channels —
the DenseYOLO compact head, NOT YOLO's ``A*(C+5)`` — with intermediate
predict widths of 8x/4x/2x ``(A0 + C + 5)`` and 1x1-reduce + 2x-upsample +
concat top-down merges between scales.  (The 8/4/2 widths all key off the
first scale's anchor count, as in the reference.)

A 'lite' variant swaps 3x3 convs for depthwise-separable ones, and
``use_spp`` inserts an SPP block in the first scale's bottleneck
(reference multigrid_head.py:316-338).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN, PredictConv, SeparableConvBN, Taps, spp, upsample2x
from .registry import register_head


class _Bottleneck(nn.Module):
    """ConvBN 1x1 -> 3x3 -> 1x1 stack; optionally SPP after the first conv."""

    filters: int
    use_spp: bool = False
    lite: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  bn_momentum=self.bn_momentum)
        conv3 = SeparableConvBN if self.lite else ConvBN
        x = ConvBN(self.filters, 1, **kw)(x, train)
        if self.use_spp:
            x = spp(x)
            x = ConvBN(self.filters, 1, **kw)(x, train)
        x = conv3(self.filters * 2, 3, **kw)(x, train)
        x = ConvBN(self.filters, 1, **kw)(x, train)
        return x


class _ScaleHead(nn.Module):
    """Bottleneck + predict branch for one scale.

    Returns (bottleneck_features, prediction_logits).
    """

    filters: int
    predict_filters: int
    out_filters: int
    use_spp: bool = False
    lite: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  bn_momentum=self.bn_momentum)
        conv3 = SeparableConvBN if self.lite else ConvBN
        x = _Bottleneck(self.filters, use_spp=self.use_spp, lite=self.lite,
                        **kw)(x, train)
        y = conv3(self.predict_filters, 3, **kw)(x, train)
        y = PredictConv(self.out_filters, dtype=self.dtype)(y)
        return x, y


@register_head('multigrid')
class MultiGridHead(nn.Module):
    """Three-scale MultiGrid head + top-down FPN over (C3, C4, C5) taps."""

    num_anchors: Tuple[int, int, int] = (3, 3, 3)
    num_classes: int = 80
    channels: Tuple[int, int, int] = (512, 256, 128)   # coarse -> fine
    use_spp: bool = False
    lite: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, taps: Taps, train: bool = False):
        c3, c4, c5 = taps
        a = self.num_anchors
        c = self.num_classes
        f1c, f2c, f3c = self.channels
        base = a[0] + c + 5
        kw = dict(use_spp=False, lite=self.lite, dtype=self.dtype,
                  bn_axis_name=self.bn_axis_name,
                  bn_momentum=self.bn_momentum)
        ckw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                   bn_momentum=self.bn_momentum)

        x, y1 = _ScaleHead(f1c // 2, 8 * base, a[0] + c + 5,
                           use_spp=self.use_spp, lite=self.lite,
                           dtype=self.dtype,
                           bn_axis_name=self.bn_axis_name,
                           bn_momentum=self.bn_momentum)(c5, train)

        x = ConvBN(f2c // 2, 1, **ckw)(x, train)
        x = upsample2x(x)
        x = jnp.concatenate([x, c4], axis=-1)
        x, y2 = _ScaleHead(f2c // 2, 4 * base, a[1] + c + 5, **kw)(x, train)

        x = ConvBN(f3c // 2, 1, **ckw)(x, train)
        x = upsample2x(x)
        x = jnp.concatenate([x, c3], axis=-1)
        _, y3 = _ScaleHead(f3c // 2, 2 * base, a[2] + c + 5, **kw)(x, train)

        return y1, y2, y3


@register_head('multigrid_lite')
class MultiGridLiteHead(MultiGridHead):
    """Depthwise-separable variant (reference multigrid_head.py:214-272)."""

    lite: bool = True


class _FiveConv(nn.Module):
    """1x1/3x3/1x1/3x3/1x1 refinement stack (PANet merge block)."""

    filters: int
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  bn_momentum=self.bn_momentum)
        for i in range(5):
            k = 3 if i % 2 == 1 else 1
            f = self.filters * 2 if i % 2 == 1 else self.filters
            x = ConvBN(f, k, **kw)(x, train)
        return x


@register_head('panet')
class PANetHead(nn.Module):
    """PANet-style head: top-down + bottom-up paths (the capability of the
    reference's unused ``yolo4_predictions``, models/layers.py:260-321),
    with the MultiGrid compact ``A + C + 5`` predict convs."""

    num_anchors: Tuple[int, int, int] = (3, 3, 3)
    num_classes: int = 80
    channels: Tuple[int, int, int] = (512, 256, 128)   # coarse -> fine
    use_spp: bool = True
    lite: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, taps: Taps, train: bool = False):
        c3, c4, c5 = taps
        a, c = self.num_anchors, self.num_classes
        f1c, f2c, f3c = self.channels
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  bn_momentum=self.bn_momentum)

        # top-down
        p5 = _Bottleneck(f1c, use_spp=self.use_spp, **kw)(c5, train)
        x = upsample2x(ConvBN(f2c // 2, 1, **kw)(p5, train))
        y4 = ConvBN(f2c // 2, 1, **kw)(c4, train)
        p4 = _FiveConv(f2c // 2, **kw)(
            jnp.concatenate([y4, x], axis=-1), train)
        x = upsample2x(ConvBN(f3c // 2, 1, **kw)(p4, train))
        y3_in = ConvBN(f3c // 2, 1, **kw)(c3, train)
        p3 = _FiveConv(f3c // 2, **kw)(
            jnp.concatenate([y3_in, x], axis=-1), train)

        # fine-scale output
        o3 = ConvBN(f3c, 3, **kw)(p3, train)
        y3 = PredictConv(a[2] + c + 5, dtype=self.dtype)(o3)

        # bottom-up
        x = ConvBN(f2c // 2, 3, strides=2, **kw)(p3, train)
        p4 = _FiveConv(f2c // 2, **kw)(
            jnp.concatenate([x, p4], axis=-1), train)
        o4 = ConvBN(f2c, 3, **kw)(p4, train)
        y2 = PredictConv(a[1] + c + 5, dtype=self.dtype)(o4)

        x = ConvBN(f1c // 2, 3, strides=2, **kw)(p4, train)
        p5 = _FiveConv(f1c // 2, **kw)(
            jnp.concatenate([x, p5], axis=-1), train)
        o5 = ConvBN(f1c, 3, **kw)(p5, train)
        y1 = PredictConv(a[0] + c + 5, dtype=self.dtype)(o5)

        return y1, y2, y3
