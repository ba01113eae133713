#!/usr/bin/env python3
"""Dump augmented batches with box overlays for visual inspection.

Counterpart of the reference's tests/visualize_augmented_batches.py: runs
the real on-device augmentation pipeline (mosaic/mixup/gridmask/color/etc.)
over annotation lines and writes PNGs with the surviving boxes drawn, so
augmentation/box consistency can be eyeballed.

Usage:
  python tools/visualize_augmented_batches.py --annotation data/val.txt \
      --classes configs/coco_classes.txt --out /tmp/augviz --batches 2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
from PIL import Image

from multigriddet_tpu.data import MultiGridDataGenerator, \
    load_annotation_lines
from multigriddet_tpu.utils import load_anchors, load_classes
from multigriddet_tpu.utils.visualization import draw_boxes, get_colors


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--annotation', required=True)
    p.add_argument('--classes', required=True)
    p.add_argument('--anchors', default=None)
    p.add_argument('--input-size', type=int, default=416)
    p.add_argument('--batch-size', type=int, default=4)
    p.add_argument('--batches', type=int, default=2)
    p.add_argument('--mosaic', type=float, default=0.5)
    p.add_argument('--mixup', type=float, default=0.25)
    p.add_argument('--out', default='output/aug_viz')
    args = p.parse_args()

    lines = load_annotation_lines(args.annotation, shuffle=True, seed=0)
    class_names = load_classes(args.classes)
    anchors = load_anchors(args.anchors)
    gen = MultiGridDataGenerator(
        lines, anchors, len(class_names),
        (args.input_size, args.input_size), args.batch_size,
        augment={'enabled': True, 'mosaic_prob': args.mosaic,
                 'mixup_prob': args.mixup, 'enhance_type': 'gridmask'},
        train=True)
    colors = get_colors(len(class_names))
    os.makedirs(args.out, exist_ok=True)
    for bi, (images, y_true, boxes) in enumerate(gen):
        if bi >= args.batches:
            break
        images = np.asarray(images)
        boxes = np.asarray(boxes)
        for i in range(images.shape[0]):
            img = (images[i] * 255).astype(np.uint8)
            bx = boxes[i]
            valid = (bx[:, 2] - bx[:, 0]) > 0
            xywh = np.stack([bx[valid, 0], bx[valid, 1],
                             bx[valid, 2] - bx[valid, 0],
                             bx[valid, 3] - bx[valid, 1]], -1)
            img = draw_boxes(img, xywh, bx[valid, 4].astype(int),
                             np.ones(int(valid.sum())), class_names,
                             colors, show_scores=False)
            path = os.path.join(args.out, f'batch{bi}_img{i}.png')
            Image.fromarray(img).save(path)
            print(f'wrote {path} ({int(valid.sum())} boxes)')
    gen.close()


if __name__ == '__main__':
    main()
