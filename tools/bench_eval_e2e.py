#!/usr/bin/env python3
"""MultiGridEvaluator end-to-end at COCO scale: 5k images through the
SHIPPED evaluator (loader -> fused forward+decode+NMS -> mAP), with the
reference's own phase accounting (inference_s vs metrics_s,
ref evaluator.py:495-525).

tools/bench_map.py times the matcher on synthetic prediction dicts;
this drives the whole product — JPEG decode, letterbox, the packed
fused infer step, letterbox-inverse, index build, and the
all-thresholds greedy matcher — exactly as ``eval.py`` runs it, and
additionally re-times the metrics phase with
``evaluation.use_parallel: true`` on the SAME predictions so the
default can rest on a measurement (VERDICT r4 #6; the reference claims
2-3x from multiprocessing at this scale, ref
eval_config.yaml.example:44-47).

The done-bar: metrics_s < inference_s at 5k images.

Usage: python tools/bench_eval_e2e.py [n_images=5000] [side=416] \
                                      [link_format=auto]
Prints one JSON line with the phase table.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(REPO, '.jax_cache'))

from bench_pipeline import make_dataset  # noqa: E402

N_IMAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
SIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 416
LINK_FORMAT = sys.argv[3] if len(sys.argv) > 3 else 'auto'

def main():
    lines = make_dataset('/tmp/bench_eval_ds', N_IMAGES)
    ann = '/tmp/bench_eval_ds/annotations.txt'
    with open(ann, 'w') as f:
        f.write('\n'.join(lines) + '\n')

    from multigriddet_tpu.config import load_config
    from multigriddet_tpu.evaluation import MultiGridEvaluator
    from multigriddet_tpu.evaluation.metrics import calculate_map

    config = load_config(os.path.join(REPO, 'configs/eval_config.yaml'),
                         config_type='eval')
    config['data'] = {'annotation': ann}
    ev = config.setdefault('evaluation', {})
    ev['input_shape'] = [SIDE, SIDE, 3]
    ev['batch_size'] = 64
    # random weights at low confidence emit a realistic per-image
    # detection load for the matcher (max_detections caps it at the
    # reference's 500, ref evaluator.py:266)
    ev['confidence_threshold'] = 0.02
    ev['save_results'] = False
    ev['use_parallel'] = False
    ev['link_format'] = LINK_FORMAT
    evaluator = MultiGridEvaluator(config)

    t0 = time.time()
    results = evaluator.evaluate()
    total_s = time.time() - t0
    t = evaluator.timing
    n_preds = int(sum(len(p['scores'])
                      for p in evaluator.predictions.values()))

    # metrics phase again, multiprocessing-parallel, same predictions
    t0 = time.time()
    calculate_map(evaluator.predictions, evaluator.ground_truths,
                  evaluator.spec['num_classes'], evaluator.iou_thresholds,
                  evaluator.interp, evaluator.optimize_classes,
                  evaluator.class_names, use_parallel=True)
    parallel_s = time.time() - t0

    out = {
        'metric': f'eval_e2e_{N_IMAGES}img_{SIDE}',
        'link_format': evaluator.link_format,
        'num_images': N_IMAGES,
        'num_predictions': n_preds,
        'inference_s': round(t['inference_s'], 2),
        'inference_images_per_sec': round(t['images_per_sec'], 1),
        'metrics_s': round(t['metrics_s'], 2),
        'metrics_parallel_s': round(parallel_s, 2),
        'total_s': round(total_s, 2),
        'metrics_lt_inference': bool(t['metrics_s'] < t['inference_s']),
        'map50': round(float(results.get('mAP50', 0.0)), 4),
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
