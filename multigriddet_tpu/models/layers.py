"""Shared flax layer primitives for the MultiGridDet-TPU model zoo.

TPU-native equivalents of the reference's Keras layer helpers
(/root/reference/multigriddet/models/layers.py:88-136): a no-bias conv +
BatchNorm + LeakyReLU(0.1) building block with Darknet's left/top padding for
stride-2 convs, mish variants, depthwise-separable variants and the SPP block.

Everything is NHWC (TPU conv layout) and threads a computation ``dtype`` so
the whole network can run in bfloat16 on the MXU while keeping float32
parameters and batch statistics.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

Dtype = Any


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=0.1)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


_ACTS: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    'leaky': leaky_relu,
    'mish': mish,
    'relu': nn.relu,
    'linear': lambda x: x,
}


class _ConvKernel(nn.Module):
    """Declares a conv kernel on the same param path/init as ``nn.Conv``.

    Used by the phase-space ConvBN path so the parameter keeps its
    CANONICAL shape (k, k, Cin, Cout) — identical tree, init stream and
    checkpoint/porting compatibility — while the forward runs a
    rearranged copy (ops/s2d.py).
    """

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param('kernel', nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _PhaseBN(nn.Module):
    """BatchNorm over a space-to-depth phase tensor with canonical params.

    Input is (B, h, w, P*C) where the same logical channel c appears in P
    spatial phases; statistics reduce over (batch, space, phase) so they
    equal ordinary BatchNorm on the un-packed (B, 2h, 2w, C) tensor, and
    scale/bias/mean/var keep their canonical (C,) shapes on the standard
    flax paths ('scale', 'bias' / batch_stats 'mean', 'var').  Mirrors
    flax.linen.BatchNorm semantics: float32 fast-variance stats, clipped
    non-negative variance, pmean over ``axis_name``, momentum EMA updates
    skipped during init.
    """

    features: int
    phases: int = 4
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c, p = self.features, self.phases
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable('batch_stats', 'var',
                               lambda s: jnp.ones(s, jnp.float32), (c,))
        if not train:
            mean, var = ra_mean.value, ra_var.value
        else:
            g = x.astype(jnp.float32).reshape(*x.shape[:-1], p, c)
            mu = jnp.mean(g, axis=(0, 1, 2, 3))
            mu2 = jnp.mean(jnp.square(g), axis=(0, 1, 2, 3))
            if self.axis_name is not None and not self.is_initializing():
                mu, mu2 = jax.lax.pmean(jnp.stack([mu, mu2]), self.axis_name)
            mean, var = mu, jnp.maximum(0.0, mu2 - jnp.square(mu))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        tile = lambda v: jnp.tile(v, p)  # noqa: E731
        y = (x - tile(mean)) * (jax.lax.rsqrt(tile(var) + self.epsilon)
                                * tile(scale)) + tile(bias)
        return y.astype(self.dtype)


class ConvBN(nn.Module):
    """Conv2D (no bias) + BatchNorm + activation — the Darknet workhorse.

    Stride-2 convs use Darknet's asymmetric ((1,0),(1,0)) top/left padding
    with VALID convolution instead of SAME, matching the reference
    (models/backbones/darknet.py:30-40).

    ``phase_in``/``phase_out`` select the space-to-depth execution rewrite
    (ops/s2d.py) for the early high-resolution stage: the input (and,
    for the stem, the output) is a 2x2 space-to-depth phase tensor and the
    conv runs with rearranged kernels whose contracting dims are 4x wider.
    Parameters keep their canonical shapes either way.  Supported combos:
    stem (k=3, s=1, phase_in+phase_out) and downsample (k=3, s=2,
    phase_in only, ordinary output).
    """

    filters: int
    kernel: int = 3
    strides: int = 1
    act: str = 'leaky'
    dtype: Dtype = jnp.float32
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    bn_axis_name: str | None = None
    phase_in: bool = False
    phase_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.phase_in or self.phase_out:
            return self._phase_call(x, train)
        if self.strides == 2:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
            padding = 'VALID'
        else:
            padding = 'SAME'
        x = nn.Conv(self.filters, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides), padding=padding,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        # named for the selective remat policy (detector.py::_build):
        # save conv outputs, recompute BN+activation in the backward pass
        x = checkpoint_name(x, 'conv_out')
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None)(x)
        return _ACTS[self.act](x)

    def _phase_call(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from ..ops import s2d
        assert self.kernel == 3 and self.phase_in, (
            'phase mode supports the 3x3 stem (phase_in+phase_out, s=1) '
            'and 3x3 downsample (phase_in, s=2) only')
        cin = x.shape[-1] // 4
        w = _ConvKernel((3, 3, cin, self.filters), name='Conv_0')()
        if self.phase_out:
            assert self.strides == 1
            x = s2d.phase_stem_conv(x, w, self.dtype)
            x = checkpoint_name(x, 'conv_out')
            x = _PhaseBN(self.filters, momentum=self.bn_momentum,
                         epsilon=self.bn_epsilon, dtype=self.dtype,
                         axis_name=self.bn_axis_name if train else None,
                         name='BatchNorm_0')(x, train)
        else:
            assert self.strides == 2
            x = s2d.phase_down_conv(x, w, self.dtype)
            x = checkpoint_name(x, 'conv_out')
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum,
                             epsilon=self.bn_epsilon, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             axis_name=(self.bn_axis_name if train
                                        else None),
                             name='BatchNorm_0')(x)
        return _ACTS[self.act](x)


class PredictConv(nn.Module):
    """The linear 1x1 prediction conv (with bias, float32 output).

    Output logits stay float32 regardless of compute dtype so decode/loss
    math is numerically stable (predict_conv layers in the reference:
    models/layers.py:122-136).
    """

    filters: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(self.filters, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        return y.astype(jnp.float32)


class SeparableConvBN(nn.Module):
    """Depthwise-separable ConvBN (reference layers.py:75-95 'lite' variant)."""

    filters: int
    kernel: int = 3
    strides: int = 1
    act: str = 'leaky'
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        if self.strides == 2:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
            padding = 'VALID'
        else:
            padding = 'SAME'
        # Depthwise
        x = nn.Conv(in_ch, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides), padding=padding,
                    feature_group_count=in_ch, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None)(x)
        x = _ACTS[self.act](x)
        # Pointwise
        x = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None)(x)
        return _ACTS[self.act](x)


def spp(x: jnp.ndarray, pool_sizes: Sequence[int] = (5, 9, 13)) -> jnp.ndarray:
    """Spatial pyramid pooling: concat of stride-1 max-pools + identity.

    Matches reference Spp_Conv2D_BN_Leaky pooling stage (layers.py:112-120);
    the trailing 1x1 ConvBN is applied by the caller.
    """
    pools = [
        nn.max_pool(x, (k, k), strides=(1, 1), padding='SAME')
        for k in pool_sizes
    ]
    return jnp.concatenate(pools[::-1] + [x], axis=-1)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (Keras UpSampling2D default)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


Taps = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
