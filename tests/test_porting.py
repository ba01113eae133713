"""Keras-h5 -> flax weight porting: numerics parity on a mini ConvBN net.

Builds an independent Keras model with the same structure as a small flax
ConvBN stack, saves its weights to HDF5, ports them, and checks the two
frameworks produce the same activations (incl. BN moving statistics, the
part the reference had to patch manually — multigriddet_darknet.py:229-276).
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from multigriddet_tpu.models.layers import ConvBN, PredictConv
from multigriddet_tpu.models.porting import port_keras_weights

tf = pytest.importorskip('tensorflow')

pytestmark = pytest.mark.slow


class MiniFlax(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = ConvBN(8, 3)(x, train)
        x = ConvBN(16, 3, strides=2)(x, train)
        return PredictConv(4)(x)


def _mini_keras():
    from tensorflow.keras import layers as L
    inp = L.Input(shape=(16, 16, 3))
    x = L.Conv2D(8, 3, padding='same', use_bias=False)(inp)
    x = L.BatchNormalization(epsilon=1e-3)(x)
    x = L.LeakyReLU(negative_slope=0.1)(x)
    x = L.ZeroPadding2D(((1, 0), (1, 0)))(x)
    x = L.Conv2D(16, 3, strides=2, padding='valid', use_bias=False)(x)
    x = L.BatchNormalization(epsilon=1e-3)(x)
    x = L.LeakyReLU(negative_slope=0.1)(x)
    out = L.Conv2D(4, 1, padding='same')(x)
    return tf.keras.Model(inp, out)


def test_port_roundtrip_numerics(tmp_path):
    keras_model = _mini_keras()
    # randomize BN stats so moving-stat porting is actually exercised
    rng = np.random.RandomState(0)
    for layer in keras_model.layers:
        ws = layer.get_weights()
        layer.set_weights([rng.randn(*w.shape).astype(np.float32) * 0.5
                           + (1.0 if w.ndim == 1 else 0.0) * 0
                           for w in ws] if ws else ws)
    # keep BN variance positive
    for layer in keras_model.layers:
        if isinstance(layer, tf.keras.layers.BatchNormalization):
            g, b, m, v = layer.get_weights()
            layer.set_weights([g, b, m, np.abs(v) + 0.5])

    h5 = tmp_path / 'mini.weights.h5'
    keras_model.save_weights(str(h5))

    model = MiniFlax()
    x = np.random.RandomState(1).rand(2, 16, 16, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    ported = port_keras_weights(str(h5), variables, model=model,
                                input_hw=(16, 16))

    got = np.asarray(model.apply(
        {'params': ported['params'], 'batch_stats': ported['batch_stats']},
        jnp.asarray(x), train=False))
    want = keras_model(x, training=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_port_legacy_h5_format(tmp_path):
    """Legacy Keras-2 HDF5 layout (layer_names/weight_names attrs) — the
    format of the reference's real checkpoints (model5.h5 era)."""
    import h5py

    model = MiniFlax()
    x = np.random.RandomState(2).rand(1, 16, 16, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    rng = np.random.RandomState(3)

    # handcraft a legacy-format file matching MiniFlax's architecture:
    # conv(8,3x3) + bn + conv(16,3x3,s2) + bn + conv(4,1x1,bias)
    specs = [
        ('conv2d', {'kernel:0': rng.randn(3, 3, 3, 8)}),
        ('batch_normalization', {
            'gamma:0': rng.uniform(0.8, 1.2, 8),
            'beta:0': rng.randn(8) * 0.1,
            'moving_mean:0': rng.randn(8) * 0.2,
            'moving_variance:0': rng.uniform(0.5, 1.5, 8)}),
        ('conv2d_1', {'kernel:0': rng.randn(3, 3, 8, 16)}),
        ('batch_normalization_1', {
            'gamma:0': rng.uniform(0.8, 1.2, 16),
            'beta:0': rng.randn(16) * 0.1,
            'moving_mean:0': rng.randn(16) * 0.2,
            'moving_variance:0': rng.uniform(0.5, 1.5, 16)}),
        ('predict_conv_1', {'kernel:0': rng.randn(1, 1, 16, 4),
                            'bias:0': rng.randn(4) * 0.1}),
    ]
    path = tmp_path / 'legacy.h5'
    with h5py.File(path, 'w') as f:
        f.attrs['layer_names'] = np.array(
            [s[0].encode() for s in specs])
        for lname, weights in specs:
            grp = f.create_group(lname)
            grp.attrs['weight_names'] = np.array(
                [f'{lname}/{w}'.encode() for w in weights])
            for wname, arr in weights.items():
                grp.create_dataset(f'{lname}/{wname}',
                                   data=arr.astype(np.float32))

    ported = port_keras_weights(str(path), variables, model=model,
                                input_hw=(16, 16))
    # every unit loaded: first conv kernel and BN stats match the fixture
    np.testing.assert_allclose(
        np.asarray(ported['params']['ConvBN_0']['Conv_0']['kernel']),
        specs[0][1]['kernel:0'], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(
            ported['batch_stats']['ConvBN_0']['BatchNorm_0']['mean']),
        specs[1][1]['moving_mean:0'], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ported['params']['PredictConv_0']['Conv_0']['bias']),
        specs[4][1]['bias:0'], rtol=1e-6)


class MiniFlaxSeparable(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        from multigriddet_tpu.models.layers import SeparableConvBN
        x = ConvBN(8, 3)(x, train)
        x = SeparableConvBN(16, 3)(x, train)
        return PredictConv(4)(x)


def _mini_keras_separable():
    from tensorflow.keras import layers as L
    inp = L.Input(shape=(16, 16, 3))
    x = L.Conv2D(8, 3, padding='same', use_bias=False)(inp)
    x = L.BatchNormalization(epsilon=1e-3)(x)
    x = L.LeakyReLU(negative_slope=0.1)(x)
    # depthwise-separable block, as the reference's lite models use
    # (reference layers.py:75-95)
    x = L.DepthwiseConv2D(3, padding='same', use_bias=False)(x)
    x = L.BatchNormalization(epsilon=1e-3)(x)
    x = L.LeakyReLU(negative_slope=0.1)(x)
    x = L.Conv2D(16, 1, padding='same', use_bias=False)(x)
    x = L.BatchNormalization(epsilon=1e-3)(x)
    x = L.LeakyReLU(negative_slope=0.1)(x)
    out = L.Conv2D(4, 1, padding='same')(x)
    return tf.keras.Model(inp, out)


def test_port_depthwise_separable_numerics(tmp_path):
    """Keras DepthwiseConv2D kernels are (k,k,C,1); flax depthwise convs
    store (k,k,1,C).  Porting must transpose, not silently skip, or lite
    models keep random depthwise weights."""
    keras_model = _mini_keras_separable()
    rng = np.random.RandomState(2)
    for layer in keras_model.layers:
        ws = layer.get_weights()
        if ws:
            layer.set_weights([rng.randn(*w.shape).astype(np.float32) * 0.5
                               for w in ws])
    for layer in keras_model.layers:
        if isinstance(layer, tf.keras.layers.BatchNormalization):
            g, b, m, v = layer.get_weights()
            layer.set_weights([g, b, m, np.abs(v) + 0.5])

    h5 = tmp_path / 'sep.weights.h5'
    keras_model.save_weights(str(h5))

    model = MiniFlaxSeparable()
    x = np.random.RandomState(3).rand(2, 16, 16, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    ported = port_keras_weights(str(h5), variables, model=model,
                                input_hw=(16, 16))

    got = np.asarray(model.apply(
        {'params': ported['params'], 'batch_stats': ported['batch_stats']},
        jnp.asarray(x), train=False))
    want = keras_model(x, training=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
