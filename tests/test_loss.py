"""MultiGridLoss tests on synthetic fixtures (tiny grids for fast compiles).

Models the reference test strategy (SURVEY.md §4): golden behavior checks on
hand-built tensors — perfect predictions give near-zero positive losses,
gradients exist and are finite, each option/config branch runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigriddet_tpu.losses import LossConfig, multigrid_loss, multigrid_loss_jit
from multigriddet_tpu.ops import encode_targets

INPUT_HW = (160, 160)
GRIDS = [(5, 5), (10, 10), (20, 20)]
NUM_CLASSES = 4
ANCHORS = [
    np.array([[112, 74], [149, 190], [80, 80]], np.float32),
    np.array([[28, 17], [56, 112], [57, 35]], np.float32),
    np.array([[9, 10], [13, 28], [28, 55]], np.float32),
]


def _targets(batch=2):
    boxes = np.zeros((batch, 6, 5), np.float32)
    boxes[0, 0] = [30, 30, 120, 110, 1]
    boxes[0, 1] = [10, 10, 40, 36, 3]
    boxes[1, 0] = [60, 50, 100, 140, 0]
    return encode_targets(boxes, ANCHORS, NUM_CLASSES, INPUT_HW, GRIDS)


def _perfect_preds(y_true):
    """Logits that decode exactly to the stored targets on positive cells.

    xy: invert tanh(.15x)+sigmoid(.15x) numerically; obj/anchor/class:
    large +- logits; wh: targets are the raw regression space already.
    """
    preds = []
    for t in y_true:
        t = np.asarray(t)
        xy_t = t[..., 0:2]
        # Newton inversion of f(x) = tanh(.15x) + sigmoid(.15x)
        x = np.zeros_like(xy_t)
        for _ in range(60):
            fx = np.tanh(0.15 * x) + 1 / (1 + np.exp(-0.15 * x))
            dfx = 0.15 * (1 - np.tanh(0.15 * x) ** 2) + \
                0.15 * np.exp(-0.15 * x) / (1 + np.exp(-0.15 * x)) ** 2
            x = x - (fx - xy_t) / np.maximum(dfx, 1e-3)
        p = np.zeros_like(t)
        p[..., 0:2] = x
        p[..., 2:4] = t[..., 2:4]
        p[..., 4] = np.where(t[..., 4] > 0.5, 12.0, -12.0)
        p[..., 5:] = np.where(t[..., 5:] > 0.5, 12.0, -12.0)
        preds.append(jnp.asarray(p))
    return preds


@pytest.fixture(scope='module')
def y_true():
    return _targets()


def test_perfect_prediction_near_zero(y_true):
    preds = _perfect_preds(y_true)
    total, metrics = multigrid_loss_jit(
        preds, y_true, ANCHORS, NUM_CLASSES, INPUT_HW,
        LossConfig(loss_option=2))
    assert float(metrics['location']) < 1e-3
    assert float(metrics['anchor']) < 1e-3
    assert float(metrics['classification']) < 1e-3
    assert float(metrics['objectness']) < 0.01
    assert float(total) < 0.05
    assert float(metrics['num_positives']) > 0


def test_bad_prediction_is_worse(y_true):
    good = _perfect_preds(y_true)
    rng = np.random.RandomState(0)
    bad = [jnp.asarray(rng.randn(*np.asarray(t).shape).astype(np.float32))
           for t in y_true]
    t_good, _ = multigrid_loss_jit(good, y_true, ANCHORS, NUM_CLASSES, INPUT_HW)
    t_bad, _ = multigrid_loss_jit(bad, y_true, ANCHORS, NUM_CLASSES, INPUT_HW)
    assert float(t_bad) > float(t_good) * 5


@pytest.mark.parametrize('cfg', [
    LossConfig(loss_option=1),
    LossConfig(loss_option=3, iou_loss_type='giou'),
    LossConfig(loss_option=3, iou_loss_type='ciou'),
    LossConfig(loss_option=2, use_focal_loss=True),
    LossConfig(loss_option=2, use_softmax_loss=True),
    LossConfig(loss_option=2, use_iou_aware_objectness=True,
               trainable_nms_weight=0.5),
    LossConfig(loss_option=2, use_consensus_loss=True),
    LossConfig(loss_option=2, label_smoothing=0.01,
               loss_normalization=('batch', 'positives')),
])
def test_all_options_finite_with_grad(y_true, cfg):
    rng = np.random.RandomState(1)
    preds = [jnp.asarray(rng.randn(*np.asarray(t).shape).astype(np.float32))
             for t in y_true]

    def loss_fn(ps):
        total, _ = multigrid_loss(
            ps, y_true, ANCHORS, NUM_CLASSES, INPUT_HW, cfg)
        return total

    total, grads = jax.jit(jax.value_and_grad(loss_fn))(preds)
    assert np.isfinite(float(total))
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.max(jnp.abs(g))) > 0


def test_class_weights_change_class_loss(y_true):
    rng = np.random.RandomState(2)
    preds = [jnp.asarray(rng.randn(*np.asarray(t).shape).astype(np.float32))
             for t in y_true]
    _, m1 = multigrid_loss_jit(preds, y_true, ANCHORS, NUM_CLASSES, INPUT_HW)
    _, m2 = multigrid_loss_jit(preds, y_true, ANCHORS, NUM_CLASSES, INPUT_HW,
                           class_weights=jnp.full((NUM_CLASSES,), 3.0))
    np.testing.assert_allclose(float(m2['classification']),
                               3 * float(m1['classification']), rtol=1e-5)
    np.testing.assert_allclose(float(m2['location']),
                               float(m1['location']), rtol=1e-6)


def test_ignore_mask_suppresses_negative_obj_loss(y_true):
    """A confident, well-localized duplicate prediction near a GT cell must
    not be penalized as a negative (the ignore-mask contract)."""
    preds = _perfect_preds(y_true)
    layer = int(np.argmax(
        [np.asarray(t)[0, :, :, 4].sum() for t in y_true]))
    t = np.asarray(y_true[layer])
    js, is_ = np.where(t[0, :, :, 4] > 0.5)
    # find a cell adjacent to the assigned region that is NOT positive
    cand = None
    for j, i in zip(js, is_):
        for dj, di in ((0, 2), (2, 0), (2, 2), (0, -2), (-2, 0)):
            jj, ii = j + dj, i + di
            if (0 <= jj < t.shape[1] and 0 <= ii < t.shape[2]
                    and t[0, jj, ii, 4] < 0.5):
                cand = (j, i, jj, ii)
                break
        if cand:
            break
    assert cand is not None
    j, i, jj, ii = cand
    p = np.asarray(preds[layer]).copy()
    src = p[0, j, i].copy()
    # plant a confident duplicate of the (correct) box in the empty cell,
    # shifting the xy offset so it decodes to (roughly) the same center
    src[0] += (i - ii) / 0.3  # crude inverse-activation shift
    src[1] += (j - jj) / 0.3
    p[0, jj, ii] = src
    preds_dup = list(preds)
    preds_dup[layer] = jnp.asarray(p)

    cfg = LossConfig(loss_option=2, ignore_thresh=0.3)
    _, m_dup = multigrid_loss_jit(preds_dup, y_true, ANCHORS, NUM_CLASSES,
                              INPUT_HW, cfg)
    cfg_no_ignore = LossConfig(loss_option=2, ignore_thresh=1.1)
    _, m_no = multigrid_loss_jit(preds_dup, y_true, ANCHORS, NUM_CLASSES,
                             INPUT_HW, cfg_no_ignore)
    # with the ignore mask active the duplicate costs less objectness
    assert float(m_dup['objectness']) < float(m_no['objectness'])


def test_consensus_zero_when_group_agrees(y_true):
    """If all cells in a 3x3 assignment group predict identically, the
    consensus variance terms must be ~zero (multigrid_loss.py:941-1043)."""
    preds = _perfect_preds(y_true)
    cfg = LossConfig(loss_option=2, use_consensus_loss=True)
    # constant predictions per channel across space -> zero variance
    const_preds = [jnp.broadcast_to(p[:, :1, :1, :], p.shape)
                   for p in preds]
    _, m = multigrid_loss_jit(const_preds, y_true, ANCHORS, NUM_CLASSES,
                              INPUT_HW, cfg)
    assert float(m['consensus_coord']) < 1e-6
    assert float(m['consensus_obj']) < 1e-6
    assert float(m['consensus_class']) < 1e-6
    # and non-constant predictions produce positive variance
    rng = np.random.RandomState(5)
    noisy = [jnp.asarray(rng.randn(*np.asarray(t).shape).astype(np.float32))
             for t in y_true]
    _, m2 = multigrid_loss_jit(noisy, y_true, ANCHORS, NUM_CLASSES,
                               INPUT_HW, cfg)
    assert float(m2['consensus_coord']) > 1e-4


def test_gt_capacity_covers_crowded_scenes():
    """>64 GTs on one layer (r1 VERDICT weak #4): the ignore-mask GT
    extraction recovers every box when max_gt_boxes covers the crowd, an
    undersized capacity silently drops some, and the loss is invariant to
    any capacity >= the GT count."""
    import jax
    from multigriddet_tpu.ops import extract_center_gt_boxes

    # 80 8x8 boxes centered on odd cells of the finest 20x20 (stride 8)
    # grid: centers 2 cells apart, so every box keeps its own center cell
    n = 0
    boxes = np.zeros((1, 100, 5), np.float32)
    for gi in range(1, 19, 2):          # rows
        for gj in range(1, 19, 2):      # cols
            if n >= 80:
                break
            cx, cy = gj * 8 + 4, gi * 8 + 4
            boxes[0, n] = [cx - 4, cy - 4, cx + 4, cy + 4, n % NUM_CLASSES]
            n += 1
    assert n == 80
    y_true = encode_targets(boxes, ANCHORS, NUM_CLASSES, INPUT_HW, GRIDS)
    finest = y_true[2]
    b100, m100 = extract_center_gt_boxes(
        finest, jnp.asarray(ANCHORS[2]), INPUT_HW, 100)
    assert int(np.asarray(m100).sum()) == 80      # every GT recovered
    got = {tuple(np.round(np.asarray(b), 2))
           for b, v in zip(np.asarray(b100[0]), np.asarray(m100[0])) if v}
    want = {(x1 + 4.0, y1 + 4.0, 8.0, 8.0)
            for x1, y1, _, _, _ in boxes[0, :80, :]}
    assert got == want
    _, m64 = extract_center_gt_boxes(
        finest, jnp.asarray(ANCHORS[2]), INPUT_HW, 64)
    assert int(np.asarray(m64).sum()) == 64       # the r1 silent truncation

    rng = np.random.RandomState(7)
    preds = [jnp.asarray(rng.randn(*np.asarray(t).shape).astype(np.float32))
             for t in y_true]
    losses = {}
    for cap in (80, 100, 300, 64):
        cfg = LossConfig(loss_option=2, max_gt_boxes=cap)
        loss, _ = multigrid_loss_jit(preds, y_true, ANCHORS, NUM_CLASSES,
                                     INPUT_HW, cfg)
        losses[cap] = float(loss)
    assert losses[80] == pytest.approx(losses[100], rel=1e-6)
    assert losses[80] == pytest.approx(losses[300], rel=1e-6)
