#!/usr/bin/env python3
"""MultiGridDet-TPU evaluation CLI.

Flag surface mirrors the reference eval.py:25-139 (--config, --weights,
--data, --batch-size, --conf, --max-images).
"""

import argparse
import sys

from multigriddet_tpu.config import load_config
from multigriddet_tpu.evaluation import MultiGridEvaluator


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='Evaluate MultiGridDet (mAP)')
    p.add_argument('--config', default='configs/eval_config.yaml')
    p.add_argument('--weights', default=None, help='.msgpack weights')
    p.add_argument('--data', default=None, help='annotation txt')
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--conf', type=float, default=None)
    p.add_argument('--max-images', type=int, default=None)
    return p.parse_args(argv)


def apply_overrides(config, args):
    if args.weights:
        config['weights_path'] = args.weights
    if args.data:
        config.setdefault('data', {})['annotation'] = args.data
    ev = config.setdefault('evaluation', {})
    if args.batch_size is not None:
        ev['batch_size'] = args.batch_size
    if args.conf is not None:
        ev['confidence_threshold'] = args.conf
    if args.max_images is not None:
        ev['max_images'] = args.max_images
    return config


def main(argv=None):
    args = parse_args(argv)
    config = load_config(args.config, config_type='eval')
    config = apply_overrides(config, args)
    evaluator = MultiGridEvaluator(config)
    try:
        results = evaluator.evaluate()
        evaluator.print_results()
        viz_cfg = config.get('visualizations', {}) or {}
        if viz_cfg.get('enabled'):
            from multigriddet_tpu.evaluation import \
                generate_evaluation_report
            produced = generate_evaluation_report(
                results, evaluator.predictions, evaluator.ground_truths,
                evaluator.class_names, viz_cfg)
            for name, path in produced.items():
                print(f'  plot: {name} -> {path}')
    except KeyboardInterrupt:
        print('\nInterrupted by user.')
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
