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
