#!/usr/bin/env python3
"""Python-API inference example (counterpart of the reference's
examples/inference_example.py)."""

import os
import sys

# run from a source checkout without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

from multigriddet_tpu.config import load_config
from multigriddet_tpu.inference import MultiGridInference


def main():
    config = load_config('configs/infer_config.yaml', config_type='infer')
    engine = MultiGridInference(config)
    image_path = sys.argv[1] if len(sys.argv) > 1 else \
        'examples/images/dog.jpg'
    boxes, classes, scores = engine.detect(Image.open(image_path))
    for box, cls, score in zip(boxes, classes, scores):
        name = engine.class_names[int(cls)]
        x, y, w, h = box
        print(f'{name:>16} {score:.3f}  [{x:.0f}, {y:.0f}, {w:.0f}x{h:.0f}]')


if __name__ == '__main__':
    main()
