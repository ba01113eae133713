#!/usr/bin/env python3
"""Export a trained model as a self-contained serving artifact.

One StableHLO program per batch size (weights folded in), loadable with
jax alone — see multigriddet_tpu/inference/export.py.

Usage:
  python tools/export_serving.py --config configs/infer_config.yaml \
      --output serving/ [--batch-sizes 1,8,32] [--check]

--check reloads the artifact and compares its outputs against the live
model on random inputs before declaring success.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(REPO, '.jax_cache'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', required=True)
    ap.add_argument('--output', required=True)
    ap.add_argument('--batch-sizes', default='1,8')
    ap.add_argument('--platforms', default='cpu,tpu')
    ap.add_argument('--check', action='store_true',
                    help='reload the artifact and compare vs live model')
    args = ap.parse_args()

    from multigriddet_tpu.config import load_config, build_model_from_config
    from multigriddet_tpu.inference.export import (ServingModel,
                                                   export_serving)
    from multigriddet_tpu.inference.engine import MultiGridInference

    config = load_config(args.config, config_type='infer')
    engine = MultiGridInference(config)
    batch_sizes = [int(b) for b in args.batch_sizes.split(',')]
    meta = export_serving(
        engine.model, engine.variables, engine.spec['anchors'],
        engine.input_hw, args.output, batch_sizes=batch_sizes,
        class_names=engine.class_names,
        platforms=[p.strip() for p in args.platforms.split(',')],
        confidence=engine.confidence,
        nms_threshold=engine.nms_threshold,
        nms_method=engine.nms_method, use_iol=engine.use_iol,
        max_boxes=engine.max_boxes, pre_nms_top_k=engine.pre_nms_top_k,
        class_aware=engine.class_aware)
    sizes = {n: os.path.getsize(os.path.join(args.output, n)) // 2**20
             for n in meta['programs'].values()}
    print(f'exported {args.output}: ' +
          ', '.join(f'{n} ({s} MB)' for n, s in sizes.items()))

    if args.check:
        from multigriddet_tpu.training.steps import fetch_detections
        serving = ServingModel(args.output)
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 255, (batch_sizes[0], *engine.input_hw, 3),
                           np.uint8)
        got = serving(imgs)
        want = fetch_detections(engine._infer(engine.variables, imgs))
        for g, w, name in zip(got, want, meta['outputs']):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=2e-5, atol=2e-5,
                err_msg=name)
        print(f'check OK: artifact matches the live model on '
              f'{imgs.shape} (outputs: {", ".join(meta["outputs"])})')


if __name__ == '__main__':
    main()
