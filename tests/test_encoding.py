"""Golden tests for the 9-cell multi-grid target encoder.

Ports the reference's core invariants:
* tests/test_9cell_alignment.py — all cells assigned to one box decode to the
  same center within 1px; stored xy offsets lie in [-1, 2).
* tests/test_target_consistency.py — the jitted JAX encoder matches the
  NumPy oracle element-wise.
"""

import numpy as np
import pytest

from multigriddet_tpu.ops import (encode_targets, encode_targets_np,
                                  extract_center_gt_boxes)

INPUT_HW = (608, 608)
GRIDS = [(19, 19), (38, 38), (76, 76)]


def _single_box_batch(cx, cy, w, h, cls=0, max_boxes=5):
    boxes = np.zeros((1, max_boxes, 5), np.float32)
    boxes[0, 0] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, cls]
    return boxes


def test_9cell_alignment(coco_anchors):
    """All assigned cells must decode back to the same box center (<=1px)."""
    cx, cy, w, h = 311.999, 311.999, 100.0, 80.0
    boxes = _single_box_batch(cx, cy, w, h, cls=7)
    y_true = encode_targets(boxes, coco_anchors, 80, INPUT_HW, GRIDS)
    y_true = [np.asarray(g) for g in y_true]

    total_assigned = 0
    for l, (gh, gw) in enumerate(GRIDS):
        grid = y_true[l][0]
        js, is_ = np.where(grid[..., 4] > 0.5)
        for j, i in zip(js, is_):
            tx, ty = grid[j, i, 0], grid[j, i, 1]
            assert -1.0 <= tx < 2.0 and -1.0 <= ty < 2.0, (
                f'offset out of expanded range at layer {l} cell {(j, i)}')
            dec_x = (tx + i) * (INPUT_HW[1] / gw)
            dec_y = (ty + j) * (INPUT_HW[0] / gh)
            # centers quantized by the reference's floor-div-2; 1px tolerance
            assert abs(dec_x - np.floor(cx)) <= 1.0
            assert abs(dec_y - np.floor(cy)) <= 1.0
            total_assigned += 1
    # the box lands on exactly one layer with up to 9 cells
    assert 1 <= total_assigned <= 9
    layers_hit = sum(int(np.any(np.asarray(g)[..., 4] > 0.5)) for g in y_true)
    assert layers_hit == 1


def test_interior_box_gets_9_cells(coco_anchors):
    """An interior box on an empty grid claims the full 3x3 neighborhood."""
    boxes = _single_box_batch(304.0, 304.0, 120.0, 150.0, cls=3)
    y_true = encode_targets(boxes, coco_anchors, 80, INPUT_HW, GRIDS)
    counts = [int(np.sum(np.asarray(g)[..., 4] > 0.5)) for g in y_true]
    assert sum(counts) == 9


def test_corner_box_clips_cells(coco_anchors):
    """A box whose center cell sits at (0,0) only gets the in-bounds cells."""
    boxes = _single_box_batch(8.0, 8.0, 120.0, 150.0, cls=3)
    y_true = encode_targets(boxes, coco_anchors, 80, INPUT_HW, GRIDS)
    counts = [int(np.sum(np.asarray(g)[..., 4] > 0.5)) for g in y_true]
    assert sum(counts) == 4  # (0,0) neighborhood clipped to 2x2


def test_wh_targets_are_log_ratios(coco_anchors):
    boxes = _single_box_batch(304.0, 304.0, 112.0, 74.0, cls=0)
    y_true = encode_targets(boxes, coco_anchors, 80, INPUT_HW, GRIDS)
    # (112, 74) is exactly anchor 0 of layer 0 -> tw = th = log(1) = 0
    grid = np.asarray(y_true[0][0])
    js, is_ = np.where(grid[..., 4] > 0.5)
    assert len(js) > 0
    np.testing.assert_allclose(grid[js, is_, 2:4], 0.0, atol=1e-5)
    # anchor one-hot must select anchor 0
    assert np.all(np.argmax(grid[js, is_, 5:8], axis=-1) == 0)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_jax_matches_numpy_oracle(coco_anchors, seed):
    """Element-wise parity of the jitted encoder with the NumPy oracle,
    including occupancy-rule interactions between overlapping boxes."""
    r = np.random.RandomState(seed)
    bsz, n = 2, 12
    boxes = np.zeros((bsz, n, 5), np.float32)
    for b in range(bsz):
        k = r.randint(3, n + 1)
        cx = r.uniform(0, 608, k)
        cy = r.uniform(0, 608, k)
        w = r.uniform(8, 300, k)
        h = r.uniform(8, 300, k)
        cls = r.randint(0, 80, k)
        boxes[b, :k] = np.stack(
            [np.clip(cx - w / 2, 0, 608), np.clip(cy - h / 2, 0, 608),
             np.clip(cx + w / 2, 0, 608), np.clip(cy + h / 2, 0, 608),
             cls], axis=-1)
        # re-derive valid w/h after clipping
        bad = ((boxes[b, :k, 2] - boxes[b, :k, 0]) *
               (boxes[b, :k, 3] - boxes[b, :k, 1])) <= 0
        boxes[b, :k][bad] = 0

    got = encode_targets(boxes, coco_anchors, 80, INPUT_HW, GRIDS)
    want = encode_targets_np(boxes, coco_anchors, 80, INPUT_HW, GRIDS)
    for l in range(3):
        np.testing.assert_allclose(
            np.asarray(got[l]), want[l], rtol=1e-3, atol=1e-4,
            err_msg=f'layer {l} mismatch')


def test_occupancy_rule_two_adjacent_boxes(coco_anchors):
    """Two boxes sharing cells: the later box overwrites only while holding
    fewer than 3 cells; afterwards occupied cells are skipped."""
    boxes = np.zeros((1, 5, 5), np.float32)
    # two same-size boxes one cell apart on layer 0 (32px stride)
    for t, cx in enumerate((304.0, 336.0)):
        w = h = 130.0
        boxes[0, t] = [cx - w / 2, 304 - h / 2, cx + w / 2, 304 + h / 2, t]
    got = encode_targets(boxes, coco_anchors, 80, INPUT_HW, GRIDS)
    want = encode_targets_np(boxes, coco_anchors, 80, INPUT_HW, GRIDS)
    for l in range(3):
        np.testing.assert_allclose(np.asarray(got[l]), want[l], atol=1e-5)
    # both classes must still be present somewhere
    grid = np.asarray(got[0][0])
    cls_map = grid[..., 8:]
    present = set(np.where(cls_map.sum(axis=(0, 1)) > 0)[0].tolist())
    assert {0, 1} <= present


def test_extract_center_gt_boxes_roundtrip(coco_anchors):
    r = np.random.RandomState(3)
    n = 8
    boxes = np.zeros((1, 20, 5), np.float32)
    cx = r.uniform(50, 550, n)
    cy = r.uniform(50, 550, n)
    w = r.uniform(20, 200, n)
    h = r.uniform(20, 200, n)
    boxes[0, :n] = np.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2,
         r.randint(0, 80, n)], axis=-1)
    y_true = encode_targets(boxes, coco_anchors, 80, INPUT_HW, GRIDS)

    recovered = []
    for l in range(3):
        bx, mask = extract_center_gt_boxes(
            y_true[l], coco_anchors[l], INPUT_HW, max_boxes=20)
        bx, mask = np.asarray(bx)[0], np.asarray(mask)[0]
        recovered.extend(bx[mask].tolist())
    recovered = np.array(recovered)
    # every original box should be recovered (centers within 1.5px after the
    # floor-quantization, wh within 2%)
    found = 0
    for t in range(n):
        tgt_cx = np.floor(((cx[t] - w[t] / 2) + (cx[t] + w[t] / 2)) / 2)
        tgt_cy = np.floor(((cy[t] - h[t] / 2) + (cy[t] + h[t] / 2)) / 2)
        d = np.abs(recovered[:, :2] - [tgt_cx, tgt_cy]).max(-1)
        j = int(np.argmin(d))
        if d[j] <= 1.5 and np.allclose(
                recovered[j, 2:4], [w[t], h[t]], rtol=2e-2):
            found += 1
    assert found >= n - 1  # allow one collision-overwrite


def test_multi_anchor_assign_adds_layers():
    """multi_anchor_assign writes qualifying other layers too (the working
    form of the reference's dead config knob, generators.py:2534-2541)."""
    from multigriddet_tpu.ops import encode_targets
    # two layers with near-identical anchors: both qualify for the box
    anchors = [np.array([[100, 100]], np.float32),
               np.array([[95, 95]], np.float32)]
    boxes = np.zeros((1, 2, 5), np.float32)
    boxes[0, 0] = [100, 100, 200, 200, 0]     # 100x100 box
    grids = [(10, 10), (20, 20)]
    single = encode_targets(boxes, anchors, 2, (320, 320), grids)
    multi = encode_targets(boxes, anchors, 2, (320, 320), grids,
                           multi_anchor_assign=True)
    pos_single = [float(np.asarray(t)[..., 4].sum()) for t in single]
    pos_multi = [float(np.asarray(t)[..., 4].sum()) for t in multi]
    # single: only the best layer gets cells; multi: both layers do
    assert (pos_single[0] == 0) != (pos_single[1] == 0)
    assert pos_multi[0] > 0 and pos_multi[1] > 0
