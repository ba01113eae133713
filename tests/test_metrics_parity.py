"""Pin calculate_map_reference to recorded reference calculate_map outputs.

The fixtures were produced by the reference's own running code
(/root/reference/multigriddet/evaluation/metrics.py:529-814) via
``python tools/record_reference_fixtures.py map`` on three synthetic
scenarios (crowded w/ score ties, absent classes, size mix), each under
COCO and VOC interpolation and under both matching paths (cached correct
xyxy IoU, and the uncached path whose BoxUtils.box_iou misreads xyxy as
center-format — utils/boxes.py:27-37).  See the divergence notes in
multigriddet_tpu/evaluation/metrics.py and docs/PARITY.md.
"""

import json
import os

import numpy as np
import pytest

from multigriddet_tpu.evaluation.metrics import (calculate_map,
                                                 calculate_map_reference)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), 'fixtures',
                           'reference')
THRESHOLDS = [0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95]


@pytest.fixture(scope='module')
def recorded():
    npz = np.load(os.path.join(FIXTURE_DIR, 'map.npz'))
    with open(os.path.join(FIXTURE_DIR, 'map_values.json')) as f:
        values = json.load(f)
    return npz, values


def _to_dict_format(npz, name):
    """Rebuild the scenario in this repo's dict-of-image format (top-left
    xywh), preserving the recorder's flat insertion order per image."""
    predictions, ground_truths = {}, {}
    p_img = npz[f'{name}_pred_img']
    p_box = npz[f'{name}_pred_box']       # xyxy
    p_cls = npz[f'{name}_pred_cls']
    p_score = npz[f'{name}_pred_score']
    g_img = npz[f'{name}_gt_img']
    g_box = npz[f'{name}_gt_box']
    g_cls = npz[f'{name}_gt_cls']

    def xywh(b):
        out = b.copy()
        out[:, 2] -= out[:, 0]
        out[:, 3] -= out[:, 1]
        return out

    for img in np.unique(np.concatenate([p_img, g_img])):
        pm, gm = p_img == img, g_img == img
        predictions[int(img)] = {
            'boxes': xywh(p_box[pm]).astype(np.float64),
            'classes': p_cls[pm].astype(np.int64),
            'scores': p_score[pm].astype(np.float64)}
        ground_truths[int(img)] = {
            'boxes': xywh(g_box[gm]).astype(np.float64),
            'classes': g_cls[gm].astype(np.int64)}
    return predictions, ground_truths


def _assert_matches(res, ref, path=''):
    for k, v in ref.items():
        assert k in res, f'missing key {path}{k}'
        if isinstance(v, dict):
            _assert_matches(res[k], v, path=f'{path}{k}/')
        else:
            np.testing.assert_allclose(
                res[k], v, atol=1e-9, rtol=1e-9,
                err_msg=f'mismatch at {path}{k}')


@pytest.mark.parametrize('scenario', ['crowded', 'absent', 'sizes'])
@pytest.mark.parametrize('run', ['coco', 'voc', 'coco_nocache'])
def test_reference_map_parity(recorded, scenario, run):
    npz, values = recorded
    predictions, ground_truths = _to_dict_format(npz, scenario)
    kw = dict(interpolation_method='voc') if run == 'voc' else {}
    if run == 'coco_nocache':
        kw['cache_ious'] = False
    res = calculate_map_reference(predictions, ground_truths, 5,
                                  THRESHOLDS, **kw)
    _assert_matches(res, values[f'{scenario}/{run}'])


def test_reference_vs_native_divergence_band(recorded):
    """The native (standard all-point COCO AP, GT-bearing classes only)
    mAP is systematically >= the reference's trapz-without-anchor AP on
    the same matches; document magnitude, don't let it silently grow.
    Exact per-scenario deltas live in docs/PARITY.md."""
    npz, values = recorded
    for scenario in ('crowded', 'sizes'):
        predictions, ground_truths = _to_dict_format(npz, scenario)
        native = calculate_map(predictions, ground_truths, 5, THRESHOLDS)
        ref = values[f'{scenario}/coco']
        assert native['mAP50'] >= ref['mAP50'] - 1e-9
        # the gap is the rectangle below the first recall point that
        # trapz drops; on these tiny fixtures (few detections/class) it
        # reaches ~0.31 of AP (docs/PARITY.md has the exact deltas) —
        # on dense real eval sets the first recall point is tiny and the
        # gap shrinks toward 0
        assert abs(native['mAP50'] - ref['mAP50']) < 0.4
        assert abs(native['mAP'] - ref['mAP']) < 0.4


def test_pred_only_class_counts_in_reference_mean(recorded):
    """Reference includes pred-only (zero-GT) classes at AP=0 in the mAP
    mean; the native path excludes them.  The 'absent' scenario has one
    such class, so reference mAP50 < native mAP50 recomputed over
    GT-bearing classes only."""
    npz, values = recorded
    predictions, ground_truths = _to_dict_format(npz, 'absent')
    res = calculate_map_reference(predictions, ground_truths, 5,
                                  THRESHOLDS)
    per_class = res['per_class']
    # class_1 is prediction-only -> AP 0.0 across the grid, still present
    assert 'class_1' in per_class and per_class['class_1']['AP'] == 0.0
    active = [v for v in per_class.values()]
    assert res['mAP50'] == pytest.approx(
        np.mean([v['AP0.50'] for v in active]))


def test_reference_mode_renders_native_schema():
    """calculate_map_reference results must render through format_results
    and the plot helpers: native-schema aliases (per_class_ap with
    ap/ap50/count, mAP_small/medium/large) are populated."""
    from multigriddet_tpu.evaluation.metrics import format_results
    rng = np.random.RandomState(0)
    predictions, ground_truths = {}, {}
    for img in range(3):
        gb = np.abs(rng.randn(4, 4)) * 40 + 5
        ground_truths[img] = {'boxes': gb.astype(np.float32),
                              'classes': np.array([0, 0, 1, 2])}
        pb = gb + rng.randn(4, 4) * 2
        predictions[img] = {'boxes': pb.astype(np.float32),
                            'classes': np.array([0, 0, 1, 2]),
                            'scores': rng.uniform(0.3, 1, 4)
                            .astype(np.float32)}
    res = calculate_map_reference(predictions, ground_truths, 3,
                                  class_names=['a', 'b', 'c'])
    assert set(res['per_class_ap']) == set(res['per_class'])
    for name, info in res['per_class_ap'].items():
        assert info['ap'] == res['per_class'][name]['AP']
        assert info['ap50'] == res['per_class'][name]['AP0.50']
        assert info['count'] > 0
    for size, key in (('small', 'APS'), ('medium', 'APM'),
                      ('large', 'APL')):
        assert res[f'mAP_{size}'] == res[key]
    text = format_results(res)
    assert 'a' in text and 'AP-S' in text  # class table + size lines
