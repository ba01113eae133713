"""Darknet53 and CSPDarknet53 backbones (flax, NHWC, bf16-capable).

Re-implements the reference Darknet53 body
(/root/reference/multigriddet/models/backbones/darknet.py:19-40): stem
conv32 + residual stages (64x1, 128x2, 256x8, 512x8, 1024x4) with feature
taps after the 256- and 512-stage (strides 8/16) and at the output (stride
32).  The reference's CSPDarknet53 is a stub that silently falls back to
plain Darknet53 (darknet.py:219-222); here it is a real CSPNet
implementation (cross-stage partial connections, mish activations, YOLOv4
style).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN, Taps
from .registry import register_backbone
from ..ops.s2d import space_to_depth


class _ResStage(nn.Module):
    """Downsample conv followed by ``num_blocks`` residual bottlenecks.

    ``phase_in`` marks the incoming tensor as 2x2 space-to-depth packed
    (ops/s2d.py): the downsample conv then runs the phase-space rewrite
    and emits ordinary space at its usual output resolution.
    """

    filters: int
    num_blocks: int
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    bn_momentum: float = 0.99
    phase_in: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  bn_momentum=self.bn_momentum)
        x = ConvBN(self.filters, 3, strides=2, phase_in=self.phase_in,
                   **kw)(x, train)
        for _ in range(self.num_blocks):
            y = ConvBN(self.filters // 2, 1, **kw)(x, train)
            y = ConvBN(self.filters, 3, **kw)(y, train)
            x = x + y
        return x


@register_backbone('darknet53')
class Darknet53(nn.Module):
    """Darknet53 body returning (C3, C4, C5) taps at strides (8, 16, 32)."""

    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    bn_momentum: float = 0.99
    out_channels: Tuple[int, int, int] = (256, 512, 1024)
    s2d_stem: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> Taps:
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  bn_momentum=self.bn_momentum)
        skw = kw
        if self.s2d_stem:
            # space-to-depth execution rewrite of the two high-res convs
            # (ops/s2d.py): same params, same math, MXU-friendly shapes
            x = space_to_depth(x, 2)
            x = ConvBN(32, 3, phase_in=True, phase_out=True, **kw)(x, train)
            x = _ResStage(64, 1, phase_in=True, **skw)(x, train)
        else:
            x = ConvBN(32, 3, **kw)(x, train)
            x = _ResStage(64, 1, **skw)(x, train)
        x = _ResStage(128, 2, **skw)(x, train)
        c3 = x = _ResStage(256, 8, **skw)(x, train)
        c4 = x = _ResStage(512, 8, **skw)(x, train)
        c5 = _ResStage(1024, 4, **skw)(x, train)
        return c3, c4, c5


class _CSPStage(nn.Module):
    """Cross-stage-partial residual stage (YOLOv4 CSPDarknet53 layout)."""

    filters: int
    num_blocks: int
    first: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    bn_momentum: float = 0.99
    phase_in: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(act='mish', dtype=self.dtype,
                  bn_axis_name=self.bn_axis_name,
                  bn_momentum=self.bn_momentum)
        hidden = self.filters if self.first else self.filters // 2
        x = ConvBN(self.filters, 3, strides=2, phase_in=self.phase_in,
                   **kw)(x, train)
        short = ConvBN(hidden, 1, **kw)(x, train)
        main = ConvBN(hidden, 1, **kw)(x, train)
        for _ in range(self.num_blocks):
            y = ConvBN(self.filters // 2, 1, **kw)(main, train)
            y = ConvBN(hidden, 3, **kw)(y, train)
            main = main + y
        main = ConvBN(hidden, 1, **kw)(main, train)
        x = jnp.concatenate([main, short], axis=-1)
        return ConvBN(self.filters, 1, **kw)(x, train)


@register_backbone('mobile_darknet')
class MobileDarknet(nn.Module):
    """Depthwise-separable Darknet-style backbone (edge/latency family).

    Same stage plan and taps as Darknet53 but with separable convs inside
    the residual stages — the backbone counterpart of the reference's
    'lite' separable head primitives (models/layers.py:75-95).
    """

    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    bn_momentum: float = 0.99
    out_channels: Tuple[int, int, int] = (128, 256, 512)
    s2d_stem: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> Taps:
        from .layers import SeparableConvBN
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  bn_momentum=self.bn_momentum)
        if self.s2d_stem:
            x = space_to_depth(x, 2)
            x = ConvBN(16, 3, phase_in=True, phase_out=True, **kw)(x, train)
        else:
            x = ConvBN(16, 3, **kw)(x, train)
        taps = []
        for i, (filters, blocks) in enumerate(
                [(32, 1), (64, 1), (128, 2), (256, 2), (512, 2)]):
            x = ConvBN(filters, 3, strides=2,
                       phase_in=(i == 0 and self.s2d_stem), **kw)(x, train)
            for _ in range(blocks):
                y = SeparableConvBN(filters, 3, **kw)(x, train)
                x = x + y
            if i >= 2:
                taps.append(x)
        return tuple(taps)


@register_backbone('csp_darknet53')
class CSPDarknet53(nn.Module):
    """Real CSPDarknet53 (the reference only stubs this architecture)."""

    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    bn_momentum: float = 0.99
    out_channels: Tuple[int, int, int] = (256, 512, 1024)
    s2d_stem: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> Taps:
        kw = dict(act='mish', dtype=self.dtype,
                  bn_axis_name=self.bn_axis_name,
                  bn_momentum=self.bn_momentum)
        skw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                   bn_momentum=self.bn_momentum)
        if self.s2d_stem:
            x = space_to_depth(x, 2)
            x = ConvBN(32, 3, phase_in=True, phase_out=True, **kw)(x, train)
            x = _CSPStage(64, 1, first=True, phase_in=True, **skw)(x, train)
        else:
            x = ConvBN(32, 3, **kw)(x, train)
            x = _CSPStage(64, 1, first=True, **skw)(x, train)
        x = _CSPStage(128, 2, **skw)(x, train)
        c3 = x = _CSPStage(256, 8, **skw)(x, train)
        c4 = x = _CSPStage(512, 8, **skw)(x, train)
        c5 = _CSPStage(1024, 4, **skw)(x, train)
        return c3, c4, c5
