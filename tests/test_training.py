"""Training-layer tests on the virtual 8-device CPU mesh (SURVEY.md §4):
sharded train step runs + loss decreases, freeze levels, checkpoint
round-trip with optimizer state (exact resume)."""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multigriddet_tpu.losses import LossConfig
from multigriddet_tpu.models.detector import MultiGridDet
from multigriddet_tpu.models.head import MultiGridHead
from multigriddet_tpu.ops import encode_targets
from multigriddet_tpu.training import (CheckpointManager, create_train_state,
                                       freeze_labels, make_eval_step,
                                       make_mesh, make_train_step,
                                       partition_optimizer, shard_batch)

HW = (64, 64)
C = 3
ANCHORS = [np.array([[40, 40]], np.float32),
           np.array([[20, 20]], np.float32),
           np.array([[10, 10]], np.float32)]


class TinyBackbone(nn.Module):
    out_channels = (16, 24, 32)

    @nn.compact
    def __call__(self, x, train=False):
        taps = []
        for i, ch in enumerate([8, 8, *self.out_channels]):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding='SAME')(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9)(x)
            x = nn.relu(x)
            if i >= 2:
                taps.append(x)
        return tuple(taps)


def tiny_model():
    bb = TinyBackbone()
    head = MultiGridHead(num_anchors=(1, 1, 1), num_classes=C,
                         channels=(16, 12, 8))
    return MultiGridDet(backbone=bb, head=head)


@pytest.fixture(scope='module')
def setup():
    model = tiny_model()
    x = jnp.zeros((8, *HW, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    boxes = np.zeros((8, 4, 5), np.float32)
    boxes[:, 0] = [10, 10, 50, 50, 1]
    boxes[:, 1] = [30, 34, 44, 60, 2]
    y_true = encode_targets(boxes, ANCHORS, C, HW)
    images = jnp.asarray(
        np.random.RandomState(0).rand(8, *HW, 3).astype(np.float32))
    return model, variables, images, y_true


def test_train_step_decreases_loss_on_mesh(setup):
    model, variables, images, y_true = setup
    mesh = make_mesh()
    assert mesh.devices.size == 8
    tx = optax.adam(1e-3)
    state = create_train_state(variables['params'],
                               variables['batch_stats'], tx)
    step = make_train_step(model, tx, ANCHORS, C, HW,
                           LossConfig(loss_option=2), mesh=mesh,
                           donate=False)
    images, = shard_batch(mesh, images)
    losses = []
    for _ in range(6):
        state, metrics = step(state, images, y_true)
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 6


def test_eval_step_runs(setup):
    model, variables, images, y_true = setup
    mesh = make_mesh()
    tx = optax.adam(1e-3)
    state = create_train_state(variables['params'],
                               variables['batch_stats'], tx)
    ev = make_eval_step(model, ANCHORS, C, HW, mesh=mesh)
    metrics = ev(state, *shard_batch(mesh, images), y_true)
    assert np.isfinite(float(metrics['loss']))


def test_freeze_level_partitions(setup):
    model, variables, _, _ = setup
    labels = freeze_labels(variables['params'], 1)
    flat = {'/'.join(map(str, k)): v for k, v in
            __import__('flax').traverse_util.flatten_dict(labels).items()}
    assert all(v == 'frozen' for k, v in flat.items()
               if k.startswith('backbone'))
    assert all(v == 'trainable' for k, v in flat.items()
               if k.startswith('head'))


def test_ema_params_track_closed_form(setup):
    """training.ema_decay: ema' = d*ema + (1-d)*params after every step,
    seeded from the initial params; untracked state keeps ema None."""
    model, variables, images, y_true = setup
    tx = optax.adam(1e-2)
    d = 0.9
    state = create_train_state(variables['params'],
                               variables['batch_stats'], tx)
    state = state.replace(ema_params=variables['params'])
    step = make_train_step(model, tx, ANCHORS, C, HW, donate=False,
                           ema_decay=d)
    expected = variables['params']
    for _ in range(3):
        state, _ = step(state, images, y_true)
        expected = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                                expected, state.params)
    for e, g in zip(jax.tree_util.tree_leaves(expected),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                   rtol=2e-6, atol=1e-7)
    # EMA lags the raw params (they moved; the average must differ)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(state.params),
                             jax.tree_util.tree_leaves(state.ema_params))]
    assert max(diffs) > 1e-5

    # without ema_decay the field stays None and steps still run
    state2 = create_train_state(variables['params'],
                                variables['batch_stats'], tx)
    step2 = make_train_step(model, tx, ANCHORS, C, HW, donate=False)
    state2, _ = step2(state2, images, y_true)
    assert state2.ema_params is None


def test_frozen_backbone_unchanged_by_updates(setup):
    model, variables, images, y_true = setup
    tx = partition_optimizer(optax.adam(1e-2), variables['params'], 1)
    state = create_train_state(variables['params'],
                               variables['batch_stats'], optax.identity())
    state = state.replace(opt_state=tx.init(variables['params']))
    step = make_train_step(model, tx, ANCHORS, C, HW, donate=False)
    new_state, _ = step(state, images, y_true)
    before = jax.tree_util.tree_leaves(variables['params']['backbone'])
    after = jax.tree_util.tree_leaves(new_state.params['backbone'])
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    hb = jax.tree_util.tree_leaves(variables['params']['head'])
    ha = jax.tree_util.tree_leaves(new_state.params['head'])
    assert any(not np.array_equal(np.asarray(b), np.asarray(a))
               for b, a in zip(hb, ha))


def test_checkpoint_roundtrip_with_opt_state(setup, tmp_path):
    model, variables, images, y_true = setup
    tx = optax.adam(1e-3)
    state = create_train_state(variables['params'],
                               variables['batch_stats'], tx)
    step = make_train_step(model, tx, ANCHORS, C, HW, donate=False)
    state, _ = step(state, images, y_true)
    mngr = CheckpointManager(str(tmp_path / 'ckpt'))
    mngr.save(1, state, {'val_loss': 1.23})
    template = create_train_state(variables['params'],
                                  variables['batch_stats'], tx)
    restored = mngr.restore(template)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (true exact resume)
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mngr.close()


def test_train_step_on_2d_mesh_spatial_partition(setup):
    """Data x spatial partitioning: images sharded over (batch, H); GSPMD
    partitions convs with halo exchanges."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from multigriddet_tpu.parallel import make_mesh_2d

    model, variables, images, y_true = setup
    mesh = make_mesh_2d(2, 4)
    tx = optax.adam(1e-3)
    state = create_train_state(variables['params'],
                               variables['batch_stats'], tx)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    images = jax.device_put(images, NamedSharding(mesh, P('batch', 'space')))
    y_true = tuple(jax.device_put(t, NamedSharding(mesh, P('batch')))
                   for t in y_true)
    step = make_train_step(model, tx, ANCHORS, C, HW, mesh=mesh,
                           donate=False)
    state, metrics = step(state, images, y_true)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 1


def test_bn_recalibration_matches_batch_moments():
    """With momentum inverted exactly, one calibration sweep over a fixed
    batch makes eval-mode forward == train-mode forward (running stats ==
    batch moments) even from badly stale stats (r1 VERDICT weak #6).

    Uses a preset model so every BN layer shares one bn_momentum, as the
    framework's factories guarantee."""
    from multigriddet_tpu.models import create_model
    from multigriddet_tpu.training import calibrate_batch_stats

    model = create_model('multigriddet_tiny', num_classes=C)
    images = jnp.asarray(
        np.random.RandomState(3).rand(4, *HW, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    stale = jax.tree_util.tree_map(lambda x: x + 1.0,
                                   variables['batch_stats'])
    calibrated = calibrate_batch_stats(
        model, variables['params'], stale, [images], max_batches=1,
        bn_momentum=0.99)
    out_train = model.apply(
        {'params': variables['params'], 'batch_stats': stale}, images,
        train=True, mutable=['batch_stats'])[0]
    out_eval = model.apply(
        {'params': variables['params'], 'batch_stats': calibrated},
        images, train=False)
    out_stale = model.apply(
        {'params': variables['params'], 'batch_stats': stale}, images,
        train=False)
    for a, b in zip(out_train, out_eval):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
    # the stale stats really were off (the calibration did something)
    gap = max(float(jnp.abs(a - b).max())
              for a, b in zip(out_train, out_stale))
    assert gap > 0.1


def test_frozen_backbone_bn_stats_frozen(setup):
    """freeze_level=1 must freeze the backbone's BatchNorm alongside its
    params (the reference's Keras trainable=False puts BN in inference
    mode); head BN keeps training.  freeze_level=2 freezes every BN."""
    import flax
    model, variables, images, y_true = setup
    mesh = make_mesh()
    tx1 = partition_optimizer(optax.adam(1e-3), variables['params'], 1)
    state = create_train_state(variables['params'],
                               variables['batch_stats'], optax.identity())
    state = state.replace(opt_state=tx1.init(variables['params']))
    step1 = make_train_step(model, tx1, ANCHORS, C, HW, mesh=mesh,
                            donate=False, freeze_level=1)
    new_state, _ = step1(state, *shard_batch(mesh, images), y_true)
    f0 = flax.traverse_util.flatten_dict(variables['batch_stats'])
    f1 = flax.traverse_util.flatten_dict(new_state.batch_stats)
    assert set(f0) == set(f1)
    head_changed = 0
    for k in f0:
        name = '/'.join(str(p) for p in k)
        if name.startswith('backbone'):
            np.testing.assert_array_equal(
                np.asarray(f0[k]), np.asarray(f1[k]),
                err_msg=f'frozen backbone BN stat updated: {name}')
        elif not np.allclose(np.asarray(f0[k]), np.asarray(f1[k])):
            head_changed += 1
    assert head_changed > 0  # head BN still trains

    tx2 = partition_optimizer(optax.adam(1e-3), variables['params'], 2)
    state2 = create_train_state(variables['params'],
                                variables['batch_stats'], optax.identity())
    state2 = state2.replace(opt_state=tx2.init(variables['params']))
    step2 = make_train_step(model, tx2, ANCHORS, C, HW, mesh=mesh,
                            donate=False, freeze_level=2)
    out2, _ = step2(state2, *shard_batch(mesh, images), y_true)
    f2 = flax.traverse_util.flatten_dict(out2.batch_stats)
    for k in f0:
        np.testing.assert_array_equal(np.asarray(f0[k]), np.asarray(f2[k]))


def test_bn_recalibration_measures_per_layer_momentum():
    """Models mixing BN momenta (ResNet hardcodes 0.9, ConvBN defaults
    0.99) must calibrate correctly even when the caller's bn_momentum
    hint is wrong for some layers: the momentum is measured per leaf."""
    from multigriddet_tpu.training import calibrate_batch_stats

    class TwoMomenta(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(4, (1, 1))(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9)(x)
            x = nn.Conv(4, (1, 1))(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99)(x)
            return (x,)

    model = TwoMomenta()
    images = jnp.asarray(
        np.random.RandomState(5).rand(4, 8, 8, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    stale = jax.tree_util.tree_map(lambda x: x + 2.0,
                                   variables['batch_stats'])
    # bn_momentum=0.99 is WRONG for the first BN; must not matter
    calibrated = calibrate_batch_stats(
        model, variables['params'], stale, [images], max_batches=1,
        bn_momentum=0.99)
    out_train = model.apply(
        {'params': variables['params'], 'batch_stats': stale}, images,
        train=True, mutable=['batch_stats'])[0]
    out_eval = model.apply(
        {'params': variables['params'], 'batch_stats': calibrated},
        images, train=False)
    np.testing.assert_allclose(np.asarray(out_train[0]),
                               np.asarray(out_eval[0]), atol=5e-3)
    import flax
    flat = flax.traverse_util.flatten_dict(calibrated)
    for k, v in flat.items():
        if k[-1] == 'var':
            assert (np.asarray(v) >= 0).all()


def test_flexible_weight_loading(tmp_path):
    """Weights files load whether they are a bare params tree or a
    {'params','batch_stats'} bundle (final_model.msgpack), for both the
    full-model and backbone-only paths."""
    from multigriddet_tpu.training.checkpoint import (
        load_backbone_flexible, load_weights_flexible, save_params)

    params = {'backbone': {'k': jnp.ones((2,))},
              'head': {'b': jnp.zeros((3,))}}
    stats = {'backbone': {'m': jnp.full((2,), 0.5)}}
    marked_p = jax.tree.map(lambda x: jnp.full_like(x, 0.25), params)
    marked_s = jax.tree.map(lambda x: jnp.full_like(x, 0.75), stats)

    bare = str(tmp_path / 'bare.msgpack')
    save_params(bare, marked_p)
    bundle = str(tmp_path / 'bundle.msgpack')
    save_params(bundle, {'params': marked_p, 'batch_stats': marked_s})

    for path in (bare, bundle):
        p, s = load_weights_flexible(path, params, stats)
        assert all(np.allclose(np.asarray(l), 0.25)
                   for l in jax.tree.leaves(p)), path
        if path == bundle:
            assert np.allclose(np.asarray(s['backbone']['m']), 0.75)
        else:  # bare file carries no stats -> template returned
            assert np.allclose(np.asarray(s['backbone']['m']), 0.5)

    # backbone-only extraction from: bare backbone tree / full params
    # tree / full bundle
    bb_only = str(tmp_path / 'bb.msgpack')
    save_params(bb_only, marked_p['backbone'])
    for path in (bb_only, bare, bundle):
        bp, bs = load_backbone_flexible(path, params['backbone'],
                                        stats['backbone'])
        assert np.allclose(np.asarray(bp['k']), 0.25), path
    _, bs = load_backbone_flexible(bundle, params['backbone'],
                                   stats['backbone'])
    assert np.allclose(np.asarray(bs['m']), 0.75)


def test_builder_entry_points(tmp_path):
    """config.build_model_for_inference / build_model_for_training
    (reference model_builder.py:260-299) build + load weights."""
    from multigriddet_tpu.config import (build_model_for_inference,
                                         build_model_for_training)
    from multigriddet_tpu.training.checkpoint import save_params

    anchors_txt = tmp_path / 'anchors.txt'
    anchors_txt.write_text('40,40\n20,20\n10,10\n')
    cfg = {'model': {'type': 'preset', 'preset': {
        'architecture': 'multigriddet_tiny', 'num_classes': 2,
        'input_shape': [64, 64, 3], 'anchors_path': str(anchors_txt)}}}

    model, variables, spec, loss_cfg = build_model_for_training(dict(cfg))
    assert spec['num_classes'] == 2 and loss_cfg is not None
    marked = jax.tree.map(lambda x: jnp.full_like(x, 0.125),
                          variables['params'])
    wpath = str(tmp_path / 'w.msgpack')
    save_params(wpath, {'params': marked,
                        'batch_stats': variables.get('batch_stats', {})})

    cfg_inf = dict(cfg, weights_path=wpath)
    model2, vars2, spec2 = build_model_for_inference(cfg_inf)
    assert all(np.allclose(np.asarray(l), 0.125)
               for l in jax.tree.leaves(vars2['params']))
    out = jax.jit(lambda v, x: model2.apply(v, x, train=False))(
        vars2, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert len(out) == 3

    # backbone-only transfer into the training builder
    bpath = str(tmp_path / 'bb.msgpack')
    save_params(bpath, marked['backbone'])
    _, vars3, _, _ = build_model_for_training(
        dict(cfg), backbone_weights_path=bpath)
    assert all(np.allclose(np.asarray(l), 0.125)
               for l in jax.tree.leaves(vars3['params']['backbone']))
    assert not np.allclose(
        np.asarray(jax.tree.leaves(vars3['params']['head'])[0]), 0.125)


def test_fused_train_step_matches_two_program_path(setup):
    """make_fused_train_step runs aug+encode+forward+backward+update in
    ONE program; with the same PRNG key it must produce the same loss
    and parameters as the two-program path (_device_stage then
    make_train_step), and the bank variant (HBM gather) must match the
    host variant given an identity gather."""
    from multigriddet_tpu.data.pipeline import _device_stage, _freeze
    from multigriddet_tpu.training import make_fused_train_step

    model, variables, _, _ = setup
    rng = np.random.RandomState(7)
    images_u8 = jnp.asarray(rng.randint(0, 255, (8, *HW, 3)), jnp.uint8)
    boxes = np.zeros((8, 4, 5), np.float32)
    boxes[:, 0] = [10, 10, 50, 50, 1]
    boxes[:, 1] = [30, 34, 44, 60, 2]
    boxes = jnp.asarray(boxes)
    key = jax.random.PRNGKey(3)
    aug = {'enabled': True, 'hflip_prob': 0.5, 'mosaic_prob': 0.3}
    tx = optax.adam(1e-3)
    cfg = LossConfig(loss_option=2)

    def fresh_state():
        return create_train_state(variables['params'],
                                  variables['batch_stats'], tx)

    # reference: two jitted programs with the same key
    img_f32, y_true, _ = _device_stage(
        images_u8, boxes, key, _freeze(aug),
        tuple(tuple(map(tuple, a.tolist())) for a in ANCHORS), C, HW,
        True, False)
    two_step = make_train_step(model, tx, ANCHORS, C, HW, cfg,
                               donate=False)
    ref_state, ref_metrics = two_step(fresh_state(), img_f32, y_true)

    host_step, bank_step = make_fused_train_step(
        model, tx, ANCHORS, C, cfg, aug_cfg=aug, donate=False)
    f_state, f_metrics = host_step(fresh_state(), images_u8, boxes, key)
    np.testing.assert_allclose(float(f_metrics['loss']),
                               float(ref_metrics['loss']), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                 ref_state.params, f_state.params)

    # bank variant: identity gather over the same pixels
    idx = jnp.arange(8, dtype=jnp.int32)
    b_state, b_metrics = bank_step(fresh_state(), images_u8, idx, boxes,
                                   key)
    np.testing.assert_allclose(float(b_metrics['loss']),
                               float(f_metrics['loss']), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                 f_state.params, b_state.params)


def test_fused_train_step_on_mesh_decreases_loss(setup):
    """The fused step compiles and learns over the 8-device mesh with
    batch-sharded uint8 inputs (the multichip e2e path)."""
    from multigriddet_tpu.training import make_fused_train_step

    model, variables, _, _ = setup
    mesh = make_mesh()
    tx = optax.adam(1e-3)
    state = create_train_state(variables['params'],
                               variables['batch_stats'], tx)
    rng = np.random.RandomState(1)
    images_u8 = jnp.asarray(rng.randint(0, 255, (8, *HW, 3)), jnp.uint8)
    boxes = np.zeros((8, 4, 5), np.float32)
    boxes[:, 0] = [10, 10, 50, 50, 1]
    boxes = jnp.asarray(boxes)
    host_step, _ = make_fused_train_step(
        model, tx, ANCHORS, C, LossConfig(loss_option=2),
        aug_cfg={'enabled': False}, mesh=mesh, donate=False)
    images_u8, = shard_batch(mesh, images_u8)
    losses = []
    for i in range(6):
        state, metrics = host_step(state, images_u8, boxes,
                                   jax.random.PRNGKey(i))
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
