"""Space-to-depth early-stage rewrite: exact-equivalence tests.

The rewrite (multigriddet_tpu/ops/s2d.py + ConvBN phase mode) must be a
pure execution strategy: identical parameter trees, identical math (up
to float reassociation), identical batch-stats updates — so checkpoints,
reference weight porting and every parity fixture hold with it on or off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigriddet_tpu.models.darknet import (
    CSPDarknet53,
    Darknet53,
    MobileDarknet,
)
from multigriddet_tpu.ops.s2d import (
    depth_to_space,
    down_kernel_to_phase,
    phase_down_conv,
    phase_stem_conv,
    space_to_depth,
    stem_kernel_to_phase,
)


def _conv(x, w, stride, darknet_pad):
    if darknet_pad:
        x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        pad = 'VALID'
    else:
        pad = 'SAME'
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class TestKernelTransforms:
    def test_s2d_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 6, 5),
                        jnp.float32)
        np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)

    def test_stem_phase_conv_matches_plain(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 16, 12, 3), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 3, 8) * 0.1, jnp.float32)
        plain = _conv(x, w, 1, darknet_pad=False)
        phased = depth_to_space(
            phase_stem_conv(space_to_depth(x), w, jnp.float32))
        np.testing.assert_allclose(phased, plain, rtol=1e-5, atol=1e-5)

    def test_down_phase_conv_matches_plain(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 16, 12, 8), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 8, 16) * 0.1, jnp.float32)
        plain = _conv(x, w, 2, darknet_pad=True)
        phased = phase_down_conv(space_to_depth(x), w, jnp.float32)
        assert phased.shape == plain.shape
        np.testing.assert_allclose(phased, plain, rtol=1e-5, atol=1e-5)

    def test_transforms_preserve_weight_mass(self):
        rng = np.random.RandomState(3)
        w = jnp.asarray(rng.randn(3, 3, 4, 6), jnp.float32)
        for wp in (stem_kernel_to_phase(w), down_kernel_to_phase(w)):
            np.testing.assert_allclose(
                jnp.sum(jnp.square(wp)),
                (wp.shape[-1] // 6) * jnp.sum(jnp.square(w)), rtol=1e-6)


import flax.linen as nn  # noqa: E402

from multigriddet_tpu.models.darknet import _CSPStage, _ResStage  # noqa: E402
from multigriddet_tpu.models.layers import ConvBN  # noqa: E402


class _EarlyStage(nn.Module):
    """The exact early-stage composition the rewrite touches.

    Train-mode equivalence is tested here rather than on the full
    backbone: beyond stage 1 both paths run IDENTICAL code, and exact
    comparison through 50+ train-mode BatchNorms is ill-conditioned
    (each divides by a batch std that can be ~1e-3 with random weights,
    amplifying the f32 reassociation noise exponentially — the same
    effect documented for cross-framework NMS ties in round 2).
    """

    s2d: bool = False
    csp: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage = _CSPStage if self.csp else _ResStage
        skw = dict(first=True) if self.csp else {}
        act = 'mish' if self.csp else 'leaky'
        if self.s2d:
            x = space_to_depth(x, 2)
            x = ConvBN(32, 3, act=act, phase_in=True,
                       phase_out=True)(x, train)
            return stage(64, 1, phase_in=True, **skw)(x, train)
        x = ConvBN(32, 3, act=act)(x, train)
        return stage(64, 1, **skw)(x, train)


def test_mobile_darknet_equivalent_eval():
    plain, phased = (MobileDarknet(s2d_stem=False),
                     MobileDarknet(s2d_stem=True))
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    vp = jax.jit(lambda: plain.init(jax.random.PRNGKey(0), x))()
    vf = jax.jit(lambda: phased.init(jax.random.PRNGKey(0), x))()
    assert (jax.tree_util.tree_structure(vp)
            == jax.tree_util.tree_structure(vf))
    tp = jax.jit(lambda v, x: plain.apply(v, x, False))(vp, x)
    tf_ = jax.jit(lambda v, x: phased.apply(v, x, False))(vp, x)
    for a, b in zip(tp, tf_):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('cls', [Darknet53, CSPDarknet53])
class TestBackboneEquivalence:
    def _pair(self, cls):
        return (cls(s2d_stem=False), cls(s2d_stem=True))

    def _early_pair(self, cls):
        csp = cls is CSPDarknet53
        return (_EarlyStage(s2d=False, csp=csp),
                _EarlyStage(s2d=True, csp=csp))

    def test_param_tree_identical(self, cls):
        plain, phased = self._pair(cls)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        vp = jax.jit(lambda: plain.init(jax.random.PRNGKey(0), x))()
        vf = jax.jit(lambda: phased.init(jax.random.PRNGKey(0), x))()
        assert (jax.tree_util.tree_structure(vp)
                == jax.tree_util.tree_structure(vf))
        for a, b in zip(jax.tree_util.tree_leaves(vp),
                        jax.tree_util.tree_leaves(vf)):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    def test_forward_equivalent(self, cls):
        plain, phased = self._pair(cls)
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
        variables = jax.jit(
            lambda: plain.init(jax.random.PRNGKey(0), x))()
        tp = jax.jit(lambda v, x: plain.apply(v, x, False))(variables, x)
        tf_ = jax.jit(lambda v, x: phased.apply(v, x, False))(variables, x)
        for a, b in zip(tp, tf_):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)

    def test_train_mode_and_batch_stats_equivalent(self, cls):
        plain, phased = self._early_pair(cls)
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
        variables = jax.jit(
            lambda: plain.init(jax.random.PRNGKey(0), x))()

        def run(model):
            return jax.jit(lambda v, x: model.apply(
                v, x, True, mutable=['batch_stats']))(variables, x)

        (tp, sp), (tf_, sf) = run(plain), run(phased)
        np.testing.assert_allclose(tf_, tp, rtol=5e-3, atol=5e-3)
        flat_p = jax.tree_util.tree_leaves_with_path(sp)
        flat_f = jax.tree_util.tree_leaves_with_path(sf)
        assert len(flat_p) == len(flat_f)
        for (ka, a), (kb, b) in zip(flat_p, flat_f):
            assert ka == kb
            np.testing.assert_allclose(
                a, b, rtol=1e-3, atol=1e-4,
                err_msg=jax.tree_util.keystr(ka))

    def test_grads_equivalent(self, cls):
        plain, phased = self._early_pair(cls)
        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
        variables = jax.jit(
            lambda: plain.init(jax.random.PRNGKey(0), x))()

        def grads(model):
            def loss(params):
                out, _ = model.apply(
                    {'params': params,
                     'batch_stats': variables['batch_stats']},
                    x, True, mutable=['batch_stats'])
                return jnp.sum(jnp.square(out))
            return jax.jit(jax.grad(loss))(variables['params'])

        gp, gf = grads(plain), grads(phased)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(gp),
                jax.tree_util.tree_leaves_with_path(gf)):
            assert ka == kb
            np.testing.assert_allclose(
                a, b, rtol=2e-2, atol=2e-3,
                err_msg=jax.tree_util.keystr(ka))


def test_module_call_order_invariant_to_s2d():
    """Weight porting maps Keras h5 layers to flax modules by traced
    execution order (porting.module_call_order).  The phase path creates
    its kernel/BN via _ConvKernel/_PhaseBN on the SAME param paths, so
    the traced order must be IDENTICAL with s2d on or off — regression
    for a bug where the unrecorded s2d modules fell to the end of the
    order and two same-shaped convs in _ResStage_0 swapped weights."""
    from multigriddet_tpu.models import create_model
    from multigriddet_tpu.models.porting import module_call_order
    orders = {}
    for s2d in (True, False):
        model = create_model('multigriddet_darknet', num_classes=4,
                             s2d_stem=s2d)
        orders[s2d] = module_call_order(model, (64, 64))
    assert orders[True] == orders[False]
    # every ConvBN contributes both its conv and its bn to the order
    flat = ['/'.join(p) for p in orders[True]]
    assert any(p.endswith('Conv_0') for p in flat)
    assert any(p.endswith('BatchNorm_0') for p in flat)
