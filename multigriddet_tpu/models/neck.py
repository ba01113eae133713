"""Composable FPN necks (the registry 'neck' slot).

TPU-native counterpart of the reference's standalone MultiGridFPN neck
(/root/reference/multigriddet/models/necks/multigrid_fpn.py:67-106), the
top-down fusion extracted from ``multigriddet_predictions`` so custom
configs can compose backbone + neck + head freely
(reference registry.py:266-305).  The preset models keep the head's
implicit FPN; a neck composed via ``build_custom`` runs BEFORE the head,
pre-fusing the backbone taps exactly as the reference's composable path
does (multigriddet_resnet.py:19-182).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN, Taps, upsample2x
from .registry import register_neck


@register_neck('multigrid_fpn')
class MultiGridFPN(nn.Module):
    """Top-down FPN over (C3, C4, C5) taps -> enhanced (N3, N4, C5).

    Mirrors the reference build_neck (necks/multigrid_fpn.py:67-106):
    1x1-reduce the coarse tap, upsample + concat into the next scale, then
    refine with a 3x3/3x3 stack; the coarsest tap passes through untouched.
    ``channels`` is (f1, f2, f3) coarse -> fine, reference defaults
    (512, 256, 128).
    """

    channels: Tuple[int, int, int] = (512, 256, 128)
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    bn_momentum: float = 0.99

    @property
    def out_channels(self) -> Tuple[int, int, int]:
        """Output tap widths fine -> coarse: (f3, f2, untouched C5).

        The C5 width is backbone-dependent; necks are always composed with a
        backbone whose ``out_channels`` the builder consults for that slot.
        """
        return (self.channels[2], self.channels[1], -1)

    @nn.compact
    def __call__(self, taps: Taps, train: bool = False):
        c3, c4, c5 = taps
        f1c, f2c, f3c = self.channels
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  bn_momentum=self.bn_momentum)

        x = ConvBN(f1c // 2, 1, **kw)(c5, train)

        x = ConvBN(f2c // 2, 1, **kw)(x, train)
        x = upsample2x(x)
        x = jnp.concatenate([x, c4], axis=-1)
        n4 = ConvBN(f2c // 2, 3, **kw)(x, train)
        n4 = ConvBN(f2c, 3, **kw)(n4, train)

        x = ConvBN(f3c // 2, 1, **kw)(x, train)
        x = upsample2x(x)
        x = jnp.concatenate([x, c3], axis=-1)
        n3 = ConvBN(f3c // 2, 3, **kw)(x, train)
        n3 = ConvBN(f3c, 3, **kw)(n3, train)

        return n3, n4, c5
