#!/usr/bin/env python3
"""mAP computation at COCO scale: 5k images x 80 classes x 10 IoU
thresholds (+ APS/APM/APL), synthetic detections.

The reference ships a multiprocessing-parallel mAP pass and documents
2-3x speedups at this scale (reference configs/eval_config.yaml.example:
44-47).  Ours precomputes a per-(class,image) IoU index and matches all
thresholds in one greedy pass, so the grid costs O(matches), not
O(grid x images) — this tool pins the wall-clock and compares it to the
chip's inference time for the same image count (the eval phase budget).

Usage: python tools/bench_map.py [n_images=5000] [use_parallel=0|1]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

from multigriddet_tpu.evaluation.metrics import calculate_map  # noqa: E402

N_IMAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
NC = 80
INFER_IPS = 2150.0  # shipped fused inference @416 b128 (BENCH_r04)


def synth(n_images, seed=0):
    """COCO-like detection stats: ~7 gts, ~12 preds per image."""
    rng = np.random.RandomState(seed)
    gts, preds = {}, {}
    for i in range(n_images):
        n = rng.randint(1, 14)
        gb = np.concatenate([rng.rand(n, 2) * 560,
                             rng.rand(n, 2) * 130 + 8], -1)
        gc = rng.randint(0, NC, n)
        gts[i] = {'boxes': gb.astype(np.float32),
                  'classes': gc.astype(np.int32)}
        m = rng.randint(2, 22)
        pb = np.concatenate([rng.rand(m, 2) * 560,
                             rng.rand(m, 2) * 130 + 8], -1)
        pc = rng.randint(0, NC, m)
        k = min(m, n)
        # ~70% of the first k preds shadow gts (mix of TP/near-miss)
        hit = rng.rand(k) < 0.7
        pb[:k][hit] = gb[:k][hit] + rng.randn(hit.sum(), 4) * 6
        pc[:k][hit] = gc[:k][hit]
        preds[i] = {'boxes': pb.astype(np.float32),
                    'classes': pc.astype(np.int32),
                    'scores': rng.rand(m).astype(np.float32)}
    return preds, gts


def main():
    preds, gts = synth(N_IMAGES)
    out = {'n_images': N_IMAGES}
    for par in (False, True):
        t0 = time.time()
        r = calculate_map(preds, gts, NC, use_parallel=par)
        dt = time.time() - t0
        out[f'map_seconds_{"par" if par else "seq"}'] = round(dt, 2)
        out['mAP'] = round(r['mAP'], 4)
    infer_s = N_IMAGES / INFER_IPS
    out['inference_seconds_equiv'] = round(infer_s, 2)
    out['metrics_under_inference'] = (
        min(out['map_seconds_seq'], out['map_seconds_par']) < infer_s)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
