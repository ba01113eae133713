"""mAP metric golden tests (hand-computable fixtures) + WBF + config layer."""

import numpy as np
import pytest

from multigriddet_tpu.evaluation.metrics import (average_precision,
                                                 calculate_map, iou_matrix,
                                                 match_detections)
from multigriddet_tpu.postprocess import weighted_boxes_fusion


def test_iou_matrix_basic():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 10, 10], [20, 20, 5, 5]],
                 np.float32)
    m = iou_matrix(a, b)
    np.testing.assert_allclose(m[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(m[0, 1], 25 / 175, atol=1e-5)
    np.testing.assert_allclose(m[0, 2], 0.0)


def test_match_detections_greedy_order():
    gt = np.array([[0, 0, 10, 10]], np.float32)
    preds = np.array([[0, 0, 10, 10], [1, 1, 10, 10]], np.float32)
    scores = np.array([0.5, 0.9], np.float32)
    tp = match_detections(preds, scores, gt, 0.5)
    # higher-scored (overlapping) box takes the GT first
    assert tp.tolist() == [False, True]


def test_average_precision_perfect():
    recalls = np.array([0.5, 1.0])
    precisions = np.array([1.0, 1.0])
    assert average_precision(recalls, precisions, 'coco') == pytest.approx(1.0)
    assert average_precision(recalls, precisions, 'voc') == pytest.approx(
        1.0, abs=0.1)


def test_calculate_map_perfect_and_miss():
    gts = {0: {'boxes': np.array([[0, 0, 10, 10], [50, 50, 40, 40]],
                                 np.float32),
               'classes': np.array([0, 1], np.int32)}}
    # perfect detector
    preds = {0: {'boxes': gts[0]['boxes'].copy(),
                 'classes': gts[0]['classes'].copy(),
                 'scores': np.array([0.9, 0.8], np.float32)}}
    r = calculate_map(preds, gts, 2, iou_thresholds=[0.5, 0.75],
                      compute_size_breakdown=True)
    assert r['mAP50'] == pytest.approx(1.0)
    assert r['mAP'] == pytest.approx(1.0)
    # small box (10x10=100 < 32^2) and medium box (40x40=1600)
    assert r['mAP_small'] == pytest.approx(1.0)
    assert r['mAP_medium'] == pytest.approx(1.0)

    # detector that misses class 1 entirely
    preds2 = {0: {'boxes': gts[0]['boxes'][:1],
                  'classes': np.array([0], np.int32),
                  'scores': np.array([0.9], np.float32)}}
    r2 = calculate_map(preds2, gts, 2, iou_thresholds=[0.5])
    assert r2['mAP50'] == pytest.approx(0.5)


def test_calculate_map_false_positive_lowers_precision():
    gts = {0: {'boxes': np.array([[0, 0, 10, 10]], np.float32),
               'classes': np.array([0], np.int32)}}
    preds = {0: {'boxes': np.array([[0, 0, 10, 10], [100, 100, 10, 10]],
                                   np.float32),
                 'classes': np.array([0, 0], np.int32),
                 'scores': np.array([0.6, 0.9], np.float32)}}
    r = calculate_map(preds, gts, 1, iou_thresholds=[0.5])
    # FP ranked above TP: precision at recall 1.0 is 0.5
    assert r['mAP50'] == pytest.approx(0.5)


def test_wbf_fuses_overlapping_boxes():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [50, 50, 8, 8]],
                     np.float32)
    scores = np.array([0.8, 0.6, 0.9], np.float32)
    classes = np.array([0, 0, 0], np.int32)
    fb, fs, fc = weighted_boxes_fusion(boxes, scores, classes, iou_thr=0.5)
    assert len(fb) == 2
    # first cluster fused by score weighting: x in (0, 1)
    fused = fb[fs != 0.9][0] if fs[0] == 0.9 else fb[0]
    cluster = fb[np.argmin(np.abs(fs - 0.7))]
    assert 0.0 < cluster[0] < 1.0


def test_wbf_respects_classes():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10]], np.float32)
    scores = np.array([0.8, 0.6], np.float32)
    classes = np.array([0, 1], np.int32)
    fb, fs, fc = weighted_boxes_fusion(boxes, scores, classes, iou_thr=0.5)
    assert len(fb) == 2  # different classes never fuse


def test_config_loader_merge_and_validation(tmp_path):
    import yaml
    from multigriddet_tpu.config import ConfigError, load_config

    model_cfg = tmp_path / 'model.yaml'
    model_cfg.write_text(yaml.safe_dump({
        'model': {'preset': {'architecture': 'multigriddet_tiny',
                             'num_classes': 2}}}))
    train_cfg = tmp_path / 'train.yaml'
    train_cfg.write_text(yaml.safe_dump({
        'model_config': 'model.yaml',
        'data': {'train_annotation': 'x.txt'},
        'training': {'batch_size': 2, 'loss_option': 2},
    }))
    cfg = load_config(str(train_cfg), config_type='train')
    assert cfg['model']['preset']['architecture'] == 'multigriddet_tiny'
    assert cfg['training']['batch_size'] == 2
    # path resolution: relative .txt resolved against the config dir
    assert cfg['data']['train_annotation'].startswith(str(tmp_path))

    bad = tmp_path / 'bad.yaml'
    bad.write_text(yaml.safe_dump({
        'data': {}, 'training': {'loss_option': 7}}))
    with pytest.raises(ConfigError):
        load_config(str(bad), config_type='train')


def test_optimizer_and_lr_factories():
    from multigriddet_tpu.config import (create_optimizer_from_config,
                                         make_lr_schedule,
                                         resolve_learning_rate)
    cfg = {'training': {'learning_rate': 1e-4},
           'optimizer': {'type': 'adamw', 'learning_rate': 5e-3},
           'lr_schedule': {'type': 'cosine_annealing', 'warmup_epochs': 1,
                           'warmup_lr_factor': 0.1, 'min_lr': 1e-6}}
    # training.learning_rate wins (reference model_builder.py:44-54)
    assert resolve_learning_rate(cfg) == pytest.approx(1e-4)
    tx = create_optimizer_from_config(cfg)
    assert tx is not None
    sched = make_lr_schedule(cfg, steps_per_epoch=10, total_epochs=10)
    assert sched(0) == pytest.approx(1e-5, rel=1e-2)    # warmup start
    assert sched(10) == pytest.approx(1e-4, rel=1e-2)   # peak after warmup
    assert sched(100) == pytest.approx(1e-6, rel=1e-1)  # decayed to min
    for kind in ('adam', 'sgd'):
        assert create_optimizer_from_config(
            {'optimizer': {'type': kind}}) is not None


def test_optimizer_decay_key_parity():
    """Reference contract for `optimizer.decay` (model_builder.py:58,74,91):
    adamw treats it as a weight_decay alias; adam/sgd pass it to Keras 3,
    which warns and ignores it — we mirror that with a warning."""
    import warnings

    import jax.numpy as jnp
    import optax
    from multigriddet_tpu.config import create_optimizer_from_config

    # adamw: decay aliases weight_decay — a pure-decay step must shrink
    # params by lr * decay exactly (decoupled decay, zero gradient moment)
    tx = create_optimizer_from_config(
        {'optimizer': {'type': 'adamw', 'decay': 0.5}}, 1e-2)
    params = {'w': jnp.ones((3,))}
    state = tx.init(params)
    updates, _ = tx.update({'w': jnp.zeros((3,))}, state, params)
    assert np.allclose(np.asarray(updates['w']), -1e-2 * 0.5, atol=1e-9)

    # adam/sgd: nonzero decay warns and is ignored (Keras 3 behavior)
    for kind in ('adam', 'sgd'):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter('always')
            tx = create_optimizer_from_config(
                {'optimizer': {'type': kind, 'decay': 0.1}}, 1e-2)
        assert any('decay' in str(x.message) for x in w), kind
        assert isinstance(tx, optax.GradientTransformation)

    # sgd defaults follow the reference: momentum=0.937, nesterov=False.
    # one step from zero momentum: update = -lr * grad (no nesterov
    # lookahead), second step shows the 0.937 momentum accumulation.
    tx = create_optimizer_from_config({'optimizer': {'type': 'sgd'}}, 1.0)
    state = tx.init(params)
    g = {'w': jnp.ones((3,))}
    u1, state = tx.update(g, state, params)
    u2, state = tx.update(g, state, params)
    assert np.allclose(np.asarray(u1['w']), -1.0)
    assert np.allclose(np.asarray(u2['w']), -(1.0 + 0.937), atol=1e-6)


def test_inject_lr_preserves_adam_moments():
    """Plateau LR reductions mutate the injected LR in the optimizer state;
    adam moments survive (Keras ReduceLROnPlateau semantics, reference
    trainers/trainer.py:398-409 — the r1 path rebuilt the optimizer)."""
    import jax
    import jax.numpy as jnp
    import optax
    from multigriddet_tpu.config import create_optimizer_from_config
    from multigriddet_tpu.training import partition_optimizer

    params = {'backbone': {'w': jnp.ones((3,))},
              'head': {'w': jnp.ones((2,))}}
    grads = jax.tree.map(jnp.ones_like, params)
    tx = create_optimizer_from_config(
        {'optimizer': {'type': 'adam'}}, 1e-3, inject_lr=True)
    tx = partition_optimizer(tx, params, freeze_level=1)
    opt_state = tx.init(params)
    updates, opt_state = tx.update(grads, opt_state, params)

    def adam_mu(state):
        return [np.asarray(x) for x in jax.tree.leaves(state)
                if hasattr(x, 'shape') and getattr(x, 'shape', ()) == (2,)]

    mu_before = adam_mu(opt_state)
    assert any(m.any() for m in mu_before)  # moments accumulated
    new_state = optax.tree_utils.tree_set(
        opt_state, learning_rate=jnp.asarray(5e-4, jnp.float32))
    mu_after = adam_mu(new_state)
    for a, b in zip(mu_before, mu_after):
        np.testing.assert_array_equal(a, b)  # moments untouched
    lr = optax.tree_utils.tree_get(new_state, 'learning_rate')
    assert float(lr) == pytest.approx(5e-4)
    # the next update actually uses the reduced LR
    up1, _ = tx.update(grads, opt_state, params)
    up2, _ = tx.update(grads, new_state, params)
    r = (np.asarray(up2['head']['w']) / np.asarray(up1['head']['w']))
    np.testing.assert_allclose(r, 0.5, rtol=1e-5)


def test_loss_config_max_gt_boxes_plumbed():
    """max_gt_boxes threads through the builder: explicit value wins;
    default = max_boxes_per_image x mosaic/mixup expansion factor."""
    from multigriddet_tpu.config import loss_config_from_config

    cfg = {'training': {'loss': {'max_gt_boxes': 37}}}
    assert loss_config_from_config(cfg).max_gt_boxes == 37
    cfg = {'training': {'augmentation': {
        'max_boxes_per_image': 50, 'mosaic_prob': 0.5, 'mixup_prob': 0.2}}}
    assert loss_config_from_config(cfg).max_gt_boxes == 400  # 50 x 8
    cfg = {'training': {'augmentation': {'max_boxes_per_image': 50}}}
    assert loss_config_from_config(cfg).max_gt_boxes == 50


def test_class_weight_helpers():
    from multigriddet_tpu.utils import (class_counts_from_annotations,
                                        compute_class_weights)
    lines = ['img.jpg 0,0,10,10,0 5,5,20,20,0 1,1,9,9,1']
    counts = class_counts_from_annotations(lines, 3)
    assert counts.tolist() == [2, 1, 0]
    w = compute_class_weights([100, 10, 1], 'balanced')
    assert w[2] > w[1] > w[0]
    assert (w >= 0.1).all() and (w <= 10.0).all()


def test_calculate_map_parallel_matches_sequential():
    rng = np.random.RandomState(7)
    gts, preds = {}, {}
    for i in range(6):
        n = rng.randint(1, 5)
        b = np.concatenate([rng.rand(n, 2) * 200,
                            rng.rand(n, 2) * 60 + 10], -1).astype(np.float32)
        c = rng.randint(0, 4, n).astype(np.int32)
        gts[i] = {'boxes': b, 'classes': c}
        preds[i] = {'boxes': b + rng.randn(n, 4).astype(np.float32) * 4,
                    'classes': c, 'scores': rng.rand(n).astype(np.float32)}
    seq = calculate_map(preds, gts, 4, iou_thresholds=[0.5, 0.75])
    par = calculate_map(preds, gts, 4, iou_thresholds=[0.5, 0.75],
                        use_parallel=True)
    assert seq['mAP'] == pytest.approx(par['mAP'])
    assert seq['mAP50'] == pytest.approx(par['mAP50'])


def test_calculate_map_indexed_matches_naive():
    """The indexed all-thresholds-at-once path (used by calculate_map)
    must reproduce the naive per-(class, threshold) _class_pr path
    exactly — randomized dataset incl. empty-pred images, pred-only
    classes, gt-only classes, ties, and the size-breakdown ranges."""
    from multigriddet_tpu.evaluation.metrics import (
        AREA_RANGES, _class_pr, average_precision)

    rng = np.random.RandomState(11)
    gts, preds = {}, {}
    for i in range(12):
        n = rng.randint(1, 6)
        b = np.concatenate([rng.rand(n, 2) * 300,
                            rng.rand(n, 2) * 120 + 4], -1).astype(np.float32)
        c = rng.randint(0, 5, n).astype(np.int32)
        gts[i] = {'boxes': b, 'classes': c}
        if i % 4 == 3:
            # image with gt but no predictions at all
            preds[i] = {'boxes': np.zeros((0, 4), np.float32),
                        'classes': np.zeros(0, np.int32),
                        'scores': np.zeros(0, np.float32)}
            continue
        m = rng.randint(1, 7)
        pb = np.concatenate([rng.rand(m, 2) * 300,
                             rng.rand(m, 2) * 120 + 4], -1)
        # half the preds shadow gt boxes (some true positives)
        k = min(m, n)
        pb[:k] = b[:k] + rng.randn(k, 4) * 3
        ps = np.round(rng.rand(m), 1)  # coarse scores -> ties
        preds[i] = {'boxes': pb.astype(np.float32),
                    'classes': rng.randint(0, 6, m).astype(np.int32),
                    'scores': ps.astype(np.float32)}

    thresholds = [0.3, 0.5, 0.75]
    got = calculate_map(preds, gts, 6, iou_thresholds=thresholds)

    # naive recomputation with the single-threshold path
    ap_grid = np.zeros((6, len(thresholds)))
    gt_counts = np.zeros(6, int)
    for c in range(6):
        for ti, thr in enumerate(thresholds):
            pr, n_gt = _class_pr(preds, gts, c, thr)
            gt_counts[c] = n_gt
            if pr is not None and n_gt > 0:
                ap_grid[c, ti] = average_precision(pr[0], pr[1], 'coco')
    valid = gt_counts > 0
    assert got['mAP'] == pytest.approx(float(ap_grid[valid].mean()))
    assert got['mAP50'] == pytest.approx(
        float(ap_grid[valid, thresholds.index(0.5)].mean()))
    for size, rng_ in AREA_RANGES.items():
        aps = []
        for c in range(6):
            per_thr = []
            for thr in thresholds:
                pr, n_gt = _class_pr(preds, gts, c, thr, area_range=rng_)
                if pr is not None and n_gt > 0:
                    per_thr.append(average_precision(pr[0], pr[1], 'coco'))
            if per_thr:
                aps.append(np.mean(per_thr))
        want = float(np.mean(aps)) if aps else 0.0
        assert got[f'mAP_{size}'] == pytest.approx(want), size


def test_kmeans_anchor_tool(tmp_path):
    import sys
    sys.path.insert(0, 'tools')
    from compute_anchors import iou_wh as tool_iou, kmeans_anchors
    rng = np.random.RandomState(0)
    # two well-separated clusters -> k-means must find both
    wh = np.concatenate([rng.normal(30, 2, (100, 2)),
                         rng.normal(120, 4, (100, 2))]).clip(5, None)
    centers = kmeans_anchors(wh, 2)
    sizes = sorted(centers[:, 0])
    assert 25 < sizes[0] < 35 and 110 < sizes[1] < 130
    mean_iou = float(np.mean(np.max(tool_iou(wh, centers), axis=1)))
    assert mean_iou > 0.85


def test_loss_config_max_gt_boxes_copypaste_capacity():
    """The derived max_gt_boxes includes copy-paste's additive +N capacity
    (pipeline.py pads boxes by copypaste_max when copypaste_prob > 0)."""
    from multigriddet_tpu.config import loss_config_from_config
    cfg = {'training': {'augmentation': {
        'max_boxes_per_image': 50, 'mosaic_prob': 0.5, 'mixup_prob': 0.5,
        'copypaste_prob': 0.2, 'copypaste_max': 6}}}
    assert loss_config_from_config(cfg).max_gt_boxes == 50 * 8 + 6
    cfg['training']['augmentation']['copypaste_prob'] = 0.0
    assert loss_config_from_config(cfg).max_gt_boxes == 50 * 8
