"""Tests for on-device decode and fixed-shape NMS."""

import numpy as np
from scipy.special import expit, softmax

from multigriddet_tpu.ops import (batched_nms, decode_predictions,
                                  decode_scale, encode_targets,
                                  undo_letterbox_boxes, xy_activation)

INPUT_HW = (608, 608)
GRIDS = [(19, 19), (38, 38), (76, 76)]
SMALL_GRIDS = [(5, 5), (10, 10), (20, 20)]


def _numpy_decode_scale(pred, anchors, input_hw, rescore=True):
    """Host oracle re-deriving the reference decode math
    (multigrid_decode.py:100-183)."""
    b, gh, gw, _ = pred.shape
    a = len(anchors)
    raw_xy, raw_wh = pred[..., 0:2], pred[..., 2:4]
    obj = expit(pred[..., 4:5])
    ap = softmax(pred[..., 5:5 + a], axis=-1)
    cp = softmax(pred[..., 5 + a:], axis=-1)
    gx, gy = np.meshgrid(np.arange(gw), np.arange(gh))
    grid = np.stack([gx, gy], -1).astype(np.float32)
    xy = (np.tanh(0.15 * raw_xy) + expit(0.15 * raw_xy) + grid) / [gw, gh]
    wh = anchors[np.argmax(ap, -1)] * np.exp(raw_wh) / [input_hw[1],
                                                        input_hw[0]]
    if rescore:
        obj = obj * ap.max(-1, keepdims=True) * cp.max(-1, keepdims=True)
    return np.concatenate([xy, wh, obj, cp], -1).reshape(b, gh * gw, -1)


def test_decode_matches_numpy_oracle(rng, coco_anchors):
    import jax
    preds = [rng.randn(2, gh, gw, 5 + 3 + 80).astype(np.float32) * 2
             for gh, gw in SMALL_GRIDS]
    got = np.asarray(jax.jit(
        lambda ps: decode_predictions(ps, coco_anchors, INPUT_HW))(preds))
    want = np.concatenate(
        [_numpy_decode_scale(p, a, INPUT_HW)
         for p, a in zip(preds, coco_anchors)], axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_decode_for_nms_matches_full_decode(rng, coco_anchors):
    """The compact fused-path decode (no [B,N,C] materialization) agrees
    with decode_predictions on boxes (exact), class ids (exact), and
    rescored scores (float-rounding: logsumexp vs materialized softmax)."""
    import jax
    from multigriddet_tpu.ops import decode_for_nms
    preds = [rng.randn(2, gh, gw, 5 + 3 + 80).astype(np.float32) * 2
             for gh, gw in SMALL_GRIDS]
    full = np.asarray(jax.jit(
        lambda ps: decode_predictions(ps, coco_anchors, INPUT_HW))(preds))
    bx, sc, cl = jax.jit(
        lambda ps: decode_for_nms(ps, coco_anchors, INPUT_HW))(preds)
    np.testing.assert_array_equal(np.asarray(bx), full[..., 0:4])
    np.testing.assert_allclose(np.asarray(sc), full[..., 4],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(cl),
                                  np.argmax(full[..., 5:], axis=-1))

    # non-default branches: sigmoid scoring and raw objectness
    for kw in ({'use_softmax': False}, {'rescore_confidence': False},
               {'use_softmax': False, 'rescore_confidence': False}):
        full = np.asarray(jax.jit(lambda ps: decode_predictions(
            ps, coco_anchors, INPUT_HW, **kw))(preds))
        bx, sc, cl = jax.jit(lambda ps: decode_for_nms(
            ps, coco_anchors, INPUT_HW, **kw))(preds)
        np.testing.assert_array_equal(np.asarray(bx), full[..., 0:4])
        np.testing.assert_allclose(np.asarray(sc), full[..., 4],
                                   rtol=1e-6, atol=1e-7)


def test_xy_activation_range():
    t = np.linspace(-100, 100, 2001).astype(np.float32)
    y = np.asarray(xy_activation(t))
    assert y.min() >= -1.0 and y.max() <= 2.0
    assert abs(float(xy_activation(np.float32(0.0))) - 0.5) < 1e-6


def test_encode_decode_roundtrip(coco_anchors):
    """Encoded targets, fed through decode geometry, give back the box."""
    cx, cy, w, h = 300.0, 260.0, 140.0, 180.0
    boxes = np.zeros((1, 5, 5), np.float32)
    boxes[0, 0] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, 11]
    y_true = encode_targets(boxes, coco_anchors, 80, INPUT_HW, GRIDS)
    for l, (gh, gw) in enumerate(GRIDS):
        grid = np.asarray(y_true[l][0])
        js, is_ = np.where(grid[..., 4] > 0.5)
        for j, i in zip(js, is_):
            dec_cx = (grid[j, i, 0] + i) / gw * INPUT_HW[1]
            dec_cy = (grid[j, i, 1] + j) / gh * INPUT_HW[0]
            anchor = coco_anchors[l][np.argmax(grid[j, i, 5:8])]
            dec_wh = anchor * np.exp(grid[j, i, 2:4])
            assert abs(dec_cx - np.floor(cx)) <= 1.0
            assert abs(dec_cy - np.floor(cy)) <= 1.0
            np.testing.assert_allclose(dec_wh, [w, h], rtol=1e-4)


def test_undo_letterbox():
    """A box centered on the letterboxed canvas maps to the image center."""
    image_hw, model_hw = (480, 640), (608, 608)
    # image scaled by 608/640=0.95 -> content 608x456, pad_y=(608-456)/2=76
    boxes = np.array([[0.5, 0.5, 0.25, 0.25]], np.float32)
    out = np.asarray(undo_letterbox_boxes(boxes, image_hw, model_hw))
    x, y, w, h = out[0]
    np.testing.assert_allclose(x + w / 2, 320.0, atol=1e-3)
    np.testing.assert_allclose(y + h / 2, 240.0, atol=1e-3)
    np.testing.assert_allclose(w, 0.25 * 608 / 0.95, rtol=1e-5)


def test_canvas_boxes_to_image_clips_to_bounds():
    """Final detections are clipped to the image rectangle, as the reference
    decoder does (multigrid_decode.py:397-422); boxes already inside are
    untouched."""
    from multigriddet_tpu.ops import canvas_boxes_to_image

    image_hw, model_hw = (480, 640), (608, 608)
    # canvas-pixel xywh boxes that land partly outside the image after the
    # letterbox inverse (one past the left/top pad, one past bottom-right)
    boxes = np.array([[-20.0, 40.0, 120.0, 120.0],
                      [540.0, 500.0, 120.0, 120.0]], np.float32)
    out = np.asarray(canvas_boxes_to_image(boxes, image_hw, model_hw))
    x2 = out[:, 0] + out[:, 2]
    y2 = out[:, 1] + out[:, 3]
    assert (out[:, 0] >= 0).all() and (out[:, 1] >= 0).all()
    assert (x2 <= 640 + 1e-3).all() and (y2 <= 480 + 1e-3).all()
    assert (out[:, 2] > 0).all() and (out[:, 3] > 0).all()
    # an interior box is identical with and without the clip
    inner = np.array([[280.0, 280.0, 50.0, 40.0]], np.float32)
    a = np.asarray(canvas_boxes_to_image(inner, image_hw, model_hw,
                                         clip=False))
    b = np.asarray(canvas_boxes_to_image(inner, image_hw, model_hw))
    np.testing.assert_allclose(a, b, atol=1e-3)


def _np_greedy_nms(boxes, scores, thr, use_iol=False, diou=False):
    order = np.argsort(scores)[::-1]
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        x1, y1, w1, h1 = boxes[i]
        x2, y2, w2, h2 = boxes[rest].T
        iw = np.maximum(0, np.minimum(x1 + w1, x2 + w2) - np.maximum(x1, x2))
        ih = np.maximum(0, np.minimum(y1 + h1, y2 + h2) - np.maximum(y1, y2))
        inter = iw * ih
        a1, a2 = w1 * h1, w2 * h2
        if use_iol:
            ov = inter / np.maximum(a1, a2)
        else:
            ov = inter / (a1 + a2 - inter + 1e-8)
        if diou:
            cd = ((x1 + w1 / 2 - x2 - w2 / 2) ** 2 +
                  (y1 + h1 / 2 - y2 - h2 / 2) ** 2)
            ex = np.maximum(x1 + w1, x2 + w2) - np.minimum(x1, x2)
            ey = np.maximum(y1 + h1, y2 + h2) - np.minimum(y1, y2)
            ov = ov - cd / (ex ** 2 + ey ** 2 + 1e-8)
        order = rest[ov < thr]
    return sorted(keep)


def test_nms_matches_numpy_greedy(rng):
    n = 60
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0:2] = rng.uniform(0, 400, (n, 2))
    boxes[:, 2:4] = rng.uniform(20, 120, (n, 2))
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
    classes = rng.randint(0, 5, n)

    for method, diou, iol in [('standard', False, False),
                              ('diou', True, True),
                              ('diou', True, False)]:
        ob, oc, osc, ov = batched_nms(
            boxes[None], scores[None], classes[None],
            confidence=0.1, nms_threshold=0.45, max_boxes=n,
            pre_nms_top_k=n, nms_method=method, use_iol=iol)
        got_kept = np.sort(np.asarray(osc)[0][np.asarray(ov)[0]])[::-1]
        conf_mask = scores >= 0.1
        idx = np.where(conf_mask)[0]
        keep = _np_greedy_nms(boxes[idx], scores[idx], 0.45,
                              use_iol=iol, diou=diou)
        want_kept = np.sort(scores[idx][keep])[::-1]
        np.testing.assert_allclose(got_kept, want_kept, rtol=1e-6,
                                   err_msg=f'method={method} iol={iol}')


def test_nms_confidence_filter_and_cap(rng):
    n = 30
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (n, 1))
    boxes += rng.uniform(0, 200, (n, 1)).astype(np.float32) * [1, 0, 0, 0]
    scores = np.linspace(0.01, 0.9, n).astype(np.float32)
    classes = np.zeros(n, np.int64)
    ob, oc, osc, ov = batched_nms(
        boxes[None], scores[None], classes[None],
        confidence=0.5, nms_threshold=0.99, max_boxes=5, pre_nms_top_k=16)
    valid = np.asarray(ov)[0]
    assert valid.sum() <= 5
    assert np.all(np.asarray(osc)[0][valid] >= 0.5)


def test_soft_and_cluster_nms_run(rng):
    n = 40
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0:2] = rng.uniform(0, 300, (n, 2))
    boxes[:, 2:4] = rng.uniform(30, 100, (n, 2))
    scores = rng.uniform(0.2, 1.0, n).astype(np.float32)
    classes = rng.randint(0, 3, n)
    for method in ('soft', 'cluster'):
        ob, oc, osc, ov = batched_nms(
            boxes[None], scores[None], classes[None],
            confidence=0.1, nms_threshold=0.5, max_boxes=20,
            pre_nms_top_k=n, nms_method=method)
        assert np.asarray(ov)[0].sum() >= 1

    # cluster-NMS must agree with greedy standard NMS on the keep-set
    ob, oc, osc, ov = batched_nms(
        boxes[None], scores[None], classes[None],
        confidence=0.1, nms_threshold=0.5, max_boxes=n,
        pre_nms_top_k=n, nms_method='cluster', use_iol=False)
    got = np.sort(np.asarray(osc)[0][np.asarray(ov)[0]])
    keep = _np_greedy_nms(boxes, scores, 0.5)
    want = np.sort(scores[keep])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_soft_nms_matches_numpy_oracle(rng):
    """Gaussian soft-NMS rescoring parity with a sequential NumPy oracle
    (reference SoftNMS semantics, nms.py:236-289: boxes are visited in the
    ORIGINAL descending-score order — never re-sorted after decay — and a
    visited box whose decayed score fell below the floor is dropped without
    suppressing others)."""
    from multigriddet_tpu.ops.nms import (_overlap_matrix, _soft_nms_sweep,
                                          NEG_INF)
    import jax.numpy as jnp
    k, sigma, floor = 32, 0.5, 0.1
    boxes = np.concatenate([rng.rand(k, 2) * 100,
                            rng.rand(k, 2) * 60 + 5], -1).astype(np.float32)
    scores = np.sort(rng.rand(k).astype(np.float32))[::-1].copy()
    valid = np.ones(k, bool)

    overlap = np.asarray(_overlap_matrix(jnp.asarray(boxes), 'standard',
                                         False))
    # sequential oracle, reference algorithm verbatim
    s = scores.copy()
    for i in range(k):
        if s[i] < floor:
            s[i] = NEG_INF
            continue
        s[i + 1:] = s[i + 1:] * np.exp(-(overlap[i, i + 1:] ** 2) / sigma)
    out = np.where(s >= floor, s, NEG_INF)
    got = np.asarray(_soft_nms_sweep(jnp.asarray(overlap),
                                     jnp.asarray(scores),
                                     jnp.asarray(valid), sigma, floor))
    kept_got = got > NEG_INF / 2
    kept_want = out > NEG_INF / 2
    np.testing.assert_array_equal(kept_got, kept_want)
    np.testing.assert_allclose(got[kept_got], out[kept_want], rtol=1e-5)


def test_class_aware_nms_keeps_cross_class_overlaps(rng):
    """class_aware=True must not suppress overlapping boxes of DIFFERENT
    classes (the class-offset trick)."""
    boxes = np.array([[10, 10, 40, 40], [12, 12, 40, 40]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    classes = np.array([0, 1], np.int64)
    # agnostic: second suppressed
    _, _, _, v_ag = batched_nms(boxes[None], scores[None], classes[None],
                                0.1, 0.5, max_boxes=4, pre_nms_top_k=4,
                                nms_method='standard', use_iol=False)
    assert int(np.asarray(v_ag).sum()) == 1
    # class-aware: both kept
    _, _, _, v_cls = batched_nms(boxes[None], scores[None], classes[None],
                                 0.1, 0.5, max_boxes=4, pre_nms_top_k=4,
                                 nms_method='standard', use_iol=False,
                                 class_aware=True)
    assert int(np.asarray(v_cls).sum()) == 2
