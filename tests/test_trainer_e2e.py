"""End-to-end trainer smoke: synthetic dataset -> train.py config ->
MultiGridTrainer.train() -> checkpoint + final weights + history, then the
evaluator consumes the trained weights.  Exercises config loading, the data
pipeline on real (synthetic) JPEG files, two-stage freeze, checkpointing,
and the eval path — the full reference train/eval call stacks
(SURVEY.md §3.1/§3.3) in miniature."""

import json
import os

import numpy as np
import pytest
import yaml
from PIL import Image, ImageDraw

pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('ds')
    rng = np.random.RandomState(0)
    lines = []
    for i in range(8):
        img = Image.fromarray(
            rng.randint(0, 255, (80, 96, 3)).astype('uint8'))
        d = ImageDraw.Draw(img)
        x1, y1 = rng.randint(5, 30), rng.randint(5, 25)
        x2, y2 = x1 + rng.randint(25, 50), y1 + rng.randint(25, 45)
        cls = i % 2
        d.rectangle([x1, y1, x2, y2],
                    fill=(250, 20, 20) if cls == 0 else (20, 250, 20))
        p = root / f'img_{i}.jpg'
        img.save(p)
        lines.append(f'{p} {x1},{y1},{x2},{y2},{cls}')
    ann = root / 'train.txt'
    ann.write_text('\n'.join(lines) + '\n')
    classes = root / 'classes.txt'
    classes.write_text('red\ngreen\n')
    anchors = root / 'anchors.txt'
    anchors.write_text('40,40\n20,20\n10,10\n')
    return root, ann, classes, anchors


def _write_config(root, ann, classes, anchors, out_dir):
    cfg = {
        'model': {
            'type': 'preset',
            'preset': {
                'architecture': 'multigriddet_tiny',
                'num_classes': 2,
                'input_shape': [64, 64, 3],
                'anchors_path': str(anchors),
                'classes_path': str(classes),
            },
        },
        'data': {
            'train_annotation': str(ann),
            'val_annotation': str(ann),
            'classes_path': str(classes),
        },
        'training': {
            'batch_size': 4,
            'epochs': 2,
            'transfer_epochs': 1,
            'freeze_level': 1,
            'learning_rate': 1e-3,
            'loss_option': 2,
            'bn_recalibrate': True,
            'bn_recalibrate_batches': 2,
            'augmentation': {
                'enabled': True, 'mosaic_prob': 0.3, 'mixup_prob': 0.1,
                'max_boxes_per_image': 10,
            },
        },
        'optimizer': {'type': 'adam'},
        'lr_schedule': {'type': 'cosine_annealing', 'warmup_epochs': 1},
        'callbacks': {
            'checkpoint': {'save_dir': str(out_dir / 'ckpt')},
            'early_stopping': {'patience': 0},
        },
        'output': {
            'log_dir': str(out_dir / 'logs'),
            'model_dir': str(out_dir / 'models'),
        },
    }
    path = root / 'train_config.yaml'
    path.write_text(yaml.safe_dump(cfg))
    return path


def test_trainer_end_to_end(dataset, tmp_path):
    from multigriddet_tpu.config import load_config
    from multigriddet_tpu.training import MultiGridTrainer

    root, ann, classes, anchors = dataset
    cfg_path = _write_config(root, ann, classes, anchors, tmp_path)
    config = load_config(str(cfg_path), config_type='train')
    trainer = MultiGridTrainer(config)
    history = trainer.train()
    assert len(history) == 2
    assert all(np.isfinite(h['loss']) for h in history)
    # two-stage: one frozen epoch then one unfrozen epoch
    final = tmp_path / 'models' / 'final_model.msgpack'
    assert final.exists()
    hist_file = tmp_path / 'logs' / 'history.jsonl'
    records = [json.loads(l) for l in hist_file.read_text().splitlines()]
    assert len(records) == 2
    assert 'val_loss' in records[0]

    # evaluator consumes the trained weights
    from multigriddet_tpu.evaluation import MultiGridEvaluator
    eval_cfg = {
        'model': config['model'],
        'weights_path': str(final),
        'data': {'annotation': str(ann), 'classes_path': str(classes)},
        'evaluation': {
            'batch_size': 4, 'input_shape': [64, 64, 3],
            'confidence_threshold': 0.05, 'max_images': 4,
            'iou_thresholds': [0.5], 'save_results': False,
        },
    }
    ev = MultiGridEvaluator(eval_cfg)
    results = ev.evaluate()
    assert 'mAP50' in results and np.isfinite(results['mAP50'])
    assert results['num_images'] == 4
    ev.print_results()


def test_trainer_ema_exports_averaged_weights(dataset, tmp_path):
    """training.ema_decay: the EMA tree rides the TrainState across the
    freeze boundary and the final export holds the AVERAGED weights (==
    the last checkpoint's ema_params, != its raw params)."""
    import jax

    from multigriddet_tpu.config import load_config
    from multigriddet_tpu.training import CheckpointManager, MultiGridTrainer
    from multigriddet_tpu.training.checkpoint import load_params

    root, ann, classes, anchors = dataset
    cfg_path = _write_config(root, ann, classes, anchors, tmp_path)
    config = load_config(str(cfg_path), config_type='train')
    config['training']['ema_decay'] = 0.8
    config['training']['bn_recalibrate'] = False
    trainer = MultiGridTrainer(config)
    history = trainer.train()
    assert len(history) == 2

    ckpt = CheckpointManager(str(tmp_path / 'ckpt'))
    raw = ckpt.restore_raw()
    ckpt.close()
    assert raw.get('ema_params') is not None

    final = tmp_path / 'models' / 'final_model.msgpack'
    template = {'params': raw['ema_params'],
                'batch_stats': raw['batch_stats']}
    exported = load_params(str(final), template)

    ema_leaves = jax.tree_util.tree_leaves(raw['ema_params'])
    raw_leaves = jax.tree_util.tree_leaves(raw['params'])
    exp_leaves = jax.tree_util.tree_leaves(exported['params'])
    assert any(np.abs(np.asarray(e) - np.asarray(r)).max() > 1e-6
               for e, r in zip(ema_leaves, raw_leaves)), \
        'EMA should lag the raw weights after training'
    for e, x in zip(ema_leaves, exp_leaves):
        np.testing.assert_allclose(np.asarray(x), np.asarray(e),
                                   rtol=1e-6, atol=1e-7)


def test_trainer_resume_from_checkpoint(dataset, tmp_path):
    """resume.enabled restores the latest full TrainState (params +
    optimizer) and continues from the recorded epoch."""
    from multigriddet_tpu.config import load_config
    from multigriddet_tpu.training import MultiGridTrainer

    root, ann, classes, anchors = dataset
    cfg_path = _write_config(root, ann, classes, anchors, tmp_path)
    config = load_config(str(cfg_path), config_type='train')
    config['training']['transfer_epochs'] = 0
    config['training']['epochs'] = 1
    trainer = MultiGridTrainer(config)
    trainer.train()

    # second run: resume on, more epochs
    config2 = load_config(str(cfg_path), config_type='train')
    config2['training']['transfer_epochs'] = 0
    config2['training']['epochs'] = 2
    config2['resume'] = {'enabled': True}
    trainer2 = MultiGridTrainer(config2)
    history = trainer2.train()
    # resumed at epoch >= 1, so at most one new epoch was trained
    assert len(history) <= 1 or all(h['epoch'] >= 1 for h in history[1:])


def test_weights_load_without_resume_enabled(dataset, tmp_path):
    """Pretrained weights (resume.weights_path) load at model build even
    when resume.enabled is off — enabled gates only the CHECKPOINT
    restore (reference trainer.py:308-322 contract: a stale checkpoint
    dir must not override a fine-tune request)."""
    import jax
    import jax.numpy as jnp
    from multigriddet_tpu.config import load_config
    from multigriddet_tpu.training import MultiGridTrainer
    from multigriddet_tpu.training.checkpoint import save_params

    root, ann, classes, anchors = dataset
    cfg_path = _write_config(root, ann, classes, anchors, tmp_path)
    config = load_config(str(cfg_path), config_type='train')
    base = MultiGridTrainer(config)
    base.build_model()
    marked = jax.tree.map(lambda x: jnp.full_like(x, 0.125),
                          base.init_params)
    wpath = str(tmp_path / 'pretrained.msgpack')
    save_params(wpath, marked)

    config2 = load_config(str(cfg_path), config_type='train')
    config2['resume'] = {'weights_path': wpath}  # no 'enabled'
    trainer = MultiGridTrainer(config2)
    trainer.build_model()
    leaves = jax.tree.leaves(trainer.init_params)
    assert all(np.allclose(np.asarray(l), 0.125) for l in leaves)


def test_trainer_reduce_on_plateau(dataset, tmp_path):
    """The plateau path rebuilds the optimizer with a reduced LR without
    crashing, and training completes."""
    import yaml
    from multigriddet_tpu.config import load_config
    from multigriddet_tpu.training import MultiGridTrainer

    root, ann, classes, anchors = dataset
    cfg_path = _write_config(root, ann, classes, anchors, tmp_path)
    config = load_config(str(cfg_path), config_type='train')
    config['training']['transfer_epochs'] = 0
    config['training']['epochs'] = 3
    config['lr_schedule'] = {'type': 'reduce_on_plateau', 'factor': 0.5,
                             'patience': 1, 'min_lr': 1e-7}
    config['training']['learning_rate'] = 1e-12
    trainer = MultiGridTrainer(config)
    history = trainer.train()
    assert len(history) == 3
    assert all(np.isfinite(h['loss']) for h in history)
    # the plateau machinery tracked an LR (reduced or not depending on
    # BN-driven val jitter); the reduction path itself is deterministic:
    assert getattr(trainer, '_plateau_lr', None) is not None


def test_evaluator_saves_coco_detections(dataset, tmp_path):
    import json as _json
    from multigriddet_tpu.evaluation import MultiGridEvaluator

    root, ann, classes, anchors = dataset
    eval_cfg = {
        'model': {'type': 'preset', 'preset': {
            'architecture': 'multigriddet_tiny', 'num_classes': 2,
            'input_shape': [64, 64, 3], 'anchors_path': str(anchors),
            'classes_path': str(classes)}},
        'data': {'annotation': str(ann), 'classes_path': str(classes)},
        'evaluation': {
            'batch_size': 4, 'input_shape': [64, 64, 3],
            'confidence_threshold': 0.01, 'max_images': 4,
            'iou_thresholds': [0.5], 'save_results': True,
            'save_detections': True,
            'results_dir': str(tmp_path / 'res')},
    }
    ev = MultiGridEvaluator(eval_cfg)
    ev.evaluate()
    det_path = tmp_path / 'res' / 'detections.json'
    assert det_path.exists()
    dets = _json.loads(det_path.read_text())
    if dets:
        d = dets[0]
        assert set(d) == {'image_id', 'category_id', 'bbox', 'score'}
        assert len(d['bbox']) == 4
    assert (tmp_path / 'res' / 'evaluation_results.json').exists()


def test_evaluator_max_detections_and_wbf(dataset, tmp_path):
    """evaluation.max_detections reaches the fused step's capacity
    (reference evaluator decodes with max_boxes=500, evaluator.py:266)
    and evaluation.use_wbf routes per-image candidates through WBF."""
    from multigriddet_tpu.evaluation import MultiGridEvaluator

    root, ann, classes, anchors = dataset
    base = {
        'model': {'type': 'preset', 'preset': {
            'architecture': 'multigriddet_tiny', 'num_classes': 2,
            'input_shape': [64, 64, 3], 'anchors_path': str(anchors),
            'classes_path': str(classes)}},
        'data': {'annotation': str(ann), 'classes_path': str(classes)},
        'evaluation': {
            'batch_size': 4, 'input_shape': [64, 64, 3],
            'confidence_threshold': 0.01, 'max_images': 4,
            'iou_thresholds': [0.5], 'save_results': False},
    }
    ev = MultiGridEvaluator(base)
    assert ev.max_detections == 500  # reference default

    cfg = dict(base)
    cfg['evaluation'] = dict(base['evaluation'], max_detections=7)
    ev_small = MultiGridEvaluator(cfg)
    assert ev_small.max_detections == 7
    ev_small.evaluate()
    assert all(len(p['boxes']) <= 7 for p in ev_small.predictions.values())

    cfg_wbf = dict(base)
    cfg_wbf['evaluation'] = dict(base['evaluation'], use_wbf=True,
                                 max_detections=7)
    ev_wbf = MultiGridEvaluator(cfg_wbf)
    assert ev_wbf.use_wbf
    res = ev_wbf.evaluate()
    assert np.isfinite(res['mAP50'])
    assert all(len(p['boxes']) <= 7 for p in ev_wbf.predictions.values())
    # WBF consumed the candidate pool: the fused step returns candidates,
    # not NMS keeps (actual fusion math is pinned in
    # tests/test_inference.py::test_engine_use_wbf_changes_outputs)
    import jax.numpy as jnp
    pool_boxes = ev_wbf._infer(ev_wbf.variables,
                               jnp.zeros((4, 64, 64, 3), jnp.uint8))[0]
    # K = full candidate pool, not max_detections
    assert pool_boxes.shape[1] == 84


def test_evaluator_reference_metrics_mode(dataset, tmp_path):
    """evaluation.metrics_mode: reference routes through the pinned
    reference-exact mAP twin (docs/PARITY.md #8-10)."""
    from multigriddet_tpu.evaluation import MultiGridEvaluator

    root, ann, classes, anchors = dataset
    cfg = {
        'model': {'type': 'preset', 'preset': {
            'architecture': 'multigriddet_tiny', 'num_classes': 2,
            'input_shape': [64, 64, 3], 'anchors_path': str(anchors),
            'classes_path': str(classes)}},
        'data': {'annotation': str(ann), 'classes_path': str(classes)},
        'evaluation': {
            'batch_size': 4, 'input_shape': [64, 64, 3],
            'confidence_threshold': 0.01, 'max_images': 4,
            'iou_thresholds': [0.5, 0.75], 'save_results': False,
            'metrics_mode': 'reference'},
    }
    ev = MultiGridEvaluator(cfg)
    res = ev.evaluate()
    # reference result schema: per_class with AP{t:.2f} keys, per_iou
    assert 'per_iou' in res and 'per_class' in res
    assert np.isfinite(res['mAP50'])
    for cls_res in res['per_class'].values():
        assert 'AP0.50' in cls_res and 'AP' in cls_res
    ev.print_results()


def test_evaluator_tolerates_missing_image_and_raises_on_io_error(
        dataset, tmp_path, monkeypatch, capsys):
    """One unreadable image must not silently truncate the eval (its GT
    counts as missed, every other image still evaluated); a producer
    failure mid-run must RAISE, not report mAP over a prefix."""
    from multigriddet_tpu.evaluation import MultiGridEvaluator

    root, ann, classes, anchors = dataset
    lines = ann.read_text().splitlines()
    bad = str(root / 'does_not_exist.jpg')
    mixed = tmp_path / 'mixed.txt'
    mixed.write_text('\n'.join(
        lines[:2] + [f'{bad} 10,10,40,40,0'] + lines[2:4]) + '\n')
    cfg = {
        'model': {'type': 'preset', 'preset': {
            'architecture': 'multigriddet_tiny', 'num_classes': 2,
            'input_shape': [64, 64, 3], 'anchors_path': str(anchors),
            'classes_path': str(classes)}},
        'data': {'annotation': str(mixed), 'classes_path': str(classes)},
        'evaluation': {'batch_size': 2, 'input_shape': [64, 64, 3],
                       'confidence_threshold': 0.05,
                       'iou_thresholds': [0.5], 'save_results': False},
    }
    ev = MultiGridEvaluator(cfg)
    results = ev.evaluate()
    assert results['num_images'] == 5
    assert len(ev.ground_truths) == 5  # nothing truncated
    # the unreadable slot (index 2) keeps its GT (misses) but must NOT
    # contribute gray-canvas hallucinations as false positives
    assert len(ev.predictions[2]['boxes']) == 0
    assert len(ev.ground_truths[2]['boxes']) == 1
    assert 'cannot read' in capsys.readouterr().out

    ev2 = MultiGridEvaluator(cfg)

    def boom(chunk, hw=None):
        raise OSError('io error mid-eval')

    # patch the loader the producer thread uses
    import multigriddet_tpu.data.annotations as ann_mod
    monkeypatch.setattr(ann_mod.HostImageLoader, 'load_batch', boom)
    with pytest.raises(OSError, match='io error mid-eval'):
        ev2.evaluate()


def test_trainer_resume_across_freeze_boundary(dataset, tmp_path):
    """Resuming a two-stage run from a checkpoint saved AFTER the unfreeze
    must restore into the stage-2 optimizer template (a stage-1
    multi_transform template cannot hold a plain opt_state tree), and a
    stage-1 checkpoint resumed into stage 2 falls back to params+fresh
    optimizer instead of crashing."""
    from multigriddet_tpu.config import load_config
    from multigriddet_tpu.training import MultiGridTrainer

    root, ann, classes, anchors = dataset
    cfg_path = _write_config(root, ann, classes, anchors, tmp_path)

    # run 1: two-stage run completes epochs 0..2 (checkpoints every epoch;
    # the latest checkpoint carries stage-2 opt_state)
    config = load_config(str(cfg_path), config_type='train')
    config['training']['transfer_epochs'] = 1
    config['training']['epochs'] = 3
    MultiGridTrainer(config).train()

    # resume with one more epoch: must select stage 2, restore the
    # stage-2 checkpoint, and train ONLY epoch 3
    config2 = load_config(str(cfg_path), config_type='train')
    config2['training']['transfer_epochs'] = 1
    config2['training']['epochs'] = 4
    config2['resume'] = {'enabled': True}
    history = MultiGridTrainer(config2).train()
    assert [h['epoch'] for h in history] == [3]

    # cross-boundary fallback: a fresh run whose checkpoints all live in
    # stage 1, resumed into stage 2
    out2 = tmp_path / 'b'
    out2.mkdir()
    cfg_path2 = _write_config(root, ann, classes, anchors, out2)
    config3 = load_config(str(cfg_path2), config_type='train')
    config3['training']['transfer_epochs'] = 1
    config3['training']['epochs'] = 1  # stage 1 only
    MultiGridTrainer(config3).train()
    config4 = load_config(str(cfg_path2), config_type='train')
    config4['training']['transfer_epochs'] = 1
    config4['training']['epochs'] = 2
    config4['resume'] = {'enabled': True}
    history4 = MultiGridTrainer(config4).train()
    assert [h['epoch'] for h in history4] == [1]


def test_cosine_schedule_continues_across_unfreeze(dataset, tmp_path,
                                                   monkeypatch):
    """Stage 2's fresh optimizer must not restart the warmup/cosine from
    step 0: the schedule is shifted by the epochs already trained, like
    the reference's global-epoch CosineAnnealingWithWarmup callback."""
    import multigriddet_tpu.training.trainer as trainer_mod
    from multigriddet_tpu.config import load_config
    from multigriddet_tpu.training import MultiGridTrainer

    root, ann, classes, anchors = dataset
    cfg_path = _write_config(root, ann, classes, anchors, tmp_path)
    config = load_config(str(cfg_path), config_type='train')
    config['training']['transfer_epochs'] = 2
    config['training']['epochs'] = 4
    config['lr_schedule'] = {'type': 'cosine_annealing',
                             'warmup_epochs': 1, 'min_lr': 1e-7}

    captured = []
    orig = trainer_mod.create_optimizer_from_config

    def spy(cfg, lr, **kw):
        captured.append(lr)
        return orig(cfg, lr, **kw)

    monkeypatch.setattr(trainer_mod, 'create_optimizer_from_config', spy)
    trainer = MultiGridTrainer(config)
    trainer.train()
    assert len(captured) == 2  # one schedule per stage
    s1, s2 = captured
    updates_per_epoch = max(len(trainer.train_gen), 1)
    # stage 2 continues where stage 1 left off (2 epochs in), far from
    # the warmup restart value
    assert float(s2(0)) == pytest.approx(
        float(s1(2 * updates_per_epoch)), rel=1e-6)
    assert float(s2(0)) != pytest.approx(float(s1(0)), rel=1e-3)


def test_trainer_finetune_from_final_model_bundle(dataset, tmp_path):
    """resume.weights_path accepts the trainer's own final_model.msgpack
    ({'params','batch_stats'} bundle) — fine-tune-from-export must
    restore params AND BN stats (was a template-strict crash)."""
    import jax
    import jax.numpy as jnp
    from multigriddet_tpu.config import load_config
    from multigriddet_tpu.training import MultiGridTrainer
    from multigriddet_tpu.training.checkpoint import save_params

    root, ann, classes, anchors = dataset
    cfg_path = _write_config(root, ann, classes, anchors, tmp_path)
    config = load_config(str(cfg_path), config_type='train')
    base = MultiGridTrainer(config)
    base.build_model()
    marked_p = jax.tree.map(lambda x: jnp.full_like(x, 0.125),
                            base.init_params)
    marked_s = jax.tree.map(lambda x: jnp.full_like(x, 0.375),
                            base.init_batch_stats)
    wpath = str(tmp_path / 'final_model.msgpack')
    save_params(wpath, {'params': marked_p, 'batch_stats': marked_s})

    config2 = load_config(str(cfg_path), config_type='train')
    config2['resume'] = {'weights_path': wpath}
    trainer = MultiGridTrainer(config2)
    trainer.build_model()
    assert all(np.allclose(np.asarray(l), 0.125)
               for l in jax.tree.leaves(trainer.init_params))
    assert all(np.allclose(np.asarray(l), 0.375)
               for l in jax.tree.leaves(trainer.init_batch_stats))
