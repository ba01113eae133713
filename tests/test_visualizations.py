"""Evaluation report plot smoke tests (matplotlib Agg)."""

import numpy as np

from multigriddet_tpu.evaluation import calculate_map
from multigriddet_tpu.evaluation.visualizations import \
    generate_evaluation_report


def test_generate_evaluation_report(tmp_path, rng):
    gts, preds = {}, {}
    for i in range(4):
        n = rng.randint(1, 4)
        b = np.concatenate([rng.rand(n, 2) * 200,
                            rng.rand(n, 2) * 80 + 10], -1).astype(np.float32)
        c = rng.randint(0, 3, n).astype(np.int32)
        gts[i] = {'boxes': b, 'classes': c}
        jitter = b + rng.randn(n, 4).astype(np.float32) * 3
        preds[i] = {'boxes': jitter, 'classes': c,
                    'scores': rng.rand(n).astype(np.float32)}
    results = calculate_map(preds, gts, 3, iou_thresholds=[0.5])
    produced = generate_evaluation_report(
        results, preds, gts, ['a', 'b', 'c'],
        {'output': {'save_dir': str(tmp_path), 'dpi': 72}})
    assert 'per_class_ap' in produced
    assert 'confusion_matrix' in produced
    assert 'iou_distribution' in produced
    assert 'confidence_analysis' in produced
    for path in produced.values():
        assert path and __import__('os').path.exists(path)


def test_pr_curve_show_keys(tmp_path, rng):
    """detection/pr_curves.show_per_class + show_averaged config keys
    (reference visualizations.py:50-51) change what gets produced."""
    import glob
    import os

    gts, preds = {}, {}
    for i in range(4):
        b = np.array([[10. + i, 10., 50., 50.]], np.float32)
        c = np.array([i % 2], np.int32)
        gts[i] = {'boxes': b, 'classes': c}
        preds[i] = {'boxes': b + 1.0, 'classes': c,
                    'scores': np.array([0.9], np.float32)}
    results = calculate_map(preds, gts, 2, iou_thresholds=[0.5])

    per_cls = str(tmp_path / 'per_cls')
    generate_evaluation_report(
        results, preds, gts, ['a', 'b'],
        {'output': {'save_dir': per_cls, 'dpi': 72},
         'plots': {'confusion_matrix': False, 'per_class_map_bar': False,
                   'iou_distribution': False, 'confidence_analysis': False},
         'pr_curves': {'show_per_class': True, 'show_averaged': False}})
    per_files = glob.glob(os.path.join(per_cls, 'pr_curves', 'pr_curve_*'))
    assert per_files, 'show_per_class must emit per-class figures'
    assert not os.path.exists(os.path.join(per_cls, 'pr_curves.png'))

    avg = str(tmp_path / 'avg')
    generate_evaluation_report(
        results, preds, gts, ['a', 'b'],
        {'output': {'save_dir': avg, 'dpi': 72},
         'plots': {'confusion_matrix': False, 'per_class_map_bar': False,
                   'iou_distribution': False, 'confidence_analysis': False},
         'pr_curves': {'show_per_class': False, 'show_averaged': True}})
    assert os.path.exists(os.path.join(avg, 'pr_curves.png'))
    assert not glob.glob(os.path.join(avg, 'pr_curves', 'pr_curve_*'))
