"""Full-architecture Keras -> flax porting parity.

Builds the COMPLETE MultiGridDet-Darknet53 graph in Keras (independently
constructed here, mirroring the published architecture's layer order),
saves its weights to HDF5, ports them into the flax flagship, and compares
the three output scales numerically.  This pins the layer-order mapping at
full scale (185-layer backbone + FPN head + the three biased predict
convs), which the mini-model test cannot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multigriddet_tpu.models import create_model
from multigriddet_tpu.models.porting import port_keras_weights

tf = pytest.importorskip('tensorflow')

NUM_CLASSES = 4
A = 3
OUT = A + NUM_CLASSES + 5


def _conv_bn_leaky(x, filters, kernel, strides=1):
    from tensorflow.keras import layers as L
    if strides == 2:
        x = L.ZeroPadding2D(((1, 0), (1, 0)))(x)
        x = L.Conv2D(filters, kernel, strides=2, padding='valid',
                     use_bias=False)(x)
    else:
        x = L.Conv2D(filters, kernel, padding='same', use_bias=False)(x)
    x = L.BatchNormalization(epsilon=1e-3)(x)
    return L.LeakyReLU(negative_slope=0.1)(x)


def _res_stage(x, filters, blocks):
    from tensorflow.keras import layers as L
    x = _conv_bn_leaky(x, filters, 3, strides=2)
    for _ in range(blocks):
        y = _conv_bn_leaky(x, filters // 2, 1)
        y = _conv_bn_leaky(y, filters, 3)
        x = L.Add()([x, y])
    return x


def _scale_head(x, nf, pred_filters, out_filters):
    from tensorflow.keras import layers as L
    x = _conv_bn_leaky(x, nf, 1)
    x = _conv_bn_leaky(x, nf * 2, 3)
    x = _conv_bn_leaky(x, nf, 1)
    y = _conv_bn_leaky(x, pred_filters, 3)
    y = L.Conv2D(out_filters, 1, padding='same')(y)
    return x, y


def _keras_flagship(input_hw):
    from tensorflow.keras import layers as L
    inp = L.Input(shape=(*input_hw, 3))
    x = _conv_bn_leaky(inp, 32, 3)
    x = _res_stage(x, 64, 1)
    x = _res_stage(x, 128, 2)
    c3 = x = _res_stage(x, 256, 8)
    c4 = x = _res_stage(x, 512, 8)
    c5 = _res_stage(x, 1024, 4)

    base = OUT
    x, y1 = _scale_head(c5, 256, 8 * base, OUT)
    x = _conv_bn_leaky(x, 128, 1)
    x = L.UpSampling2D(2)(x)
    x = L.Concatenate()([x, c4])
    x, y2 = _scale_head(x, 128, 4 * base, OUT)
    x = _conv_bn_leaky(x, 64, 1)
    x = L.UpSampling2D(2)(x)
    x = L.Concatenate()([x, c3])
    _, y3 = _scale_head(x, 64, 2 * base, OUT)
    return tf.keras.Model(inp, [y1, y2, y3])


@pytest.mark.slow
def test_full_flagship_port_numerics(tmp_path):
    hw = (64, 64)
    keras_model = _keras_flagship(hw)
    # randomize BN stats so moving-stat ordering is exercised
    rng = np.random.RandomState(0)
    for layer in keras_model.layers:
        if isinstance(layer, tf.keras.layers.BatchNormalization):
            g, b, m, v = layer.get_weights()
            layer.set_weights([
                rng.uniform(0.8, 1.2, g.shape).astype(np.float32),
                rng.normal(0, 0.1, b.shape).astype(np.float32),
                rng.normal(0, 0.2, m.shape).astype(np.float32),
                rng.uniform(0.5, 1.5, v.shape).astype(np.float32)])
    h5 = tmp_path / 'flagship.weights.h5'
    keras_model.save_weights(str(h5))

    model = create_model('multigriddet_darknet', num_classes=NUM_CLASSES)
    x = rng.rand(1, *hw, 3).astype(np.float32)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), train=False))()
    ported = port_keras_weights(str(h5), variables, model=model,
                                input_hw=hw)

    got = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        {'params': ported['params'],
         'batch_stats': ported['batch_stats']}, jnp.asarray(x))
    want = keras_model(x, training=False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(),
                                   rtol=2e-3, atol=2e-3)
