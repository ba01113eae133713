#!/usr/bin/env python3
"""Decode y_true target grids back to boxes and overlay on images.

Counterpart of the reference's tests/visualize_y_true.py debug tool: runs
the real input pipeline on a few annotation lines, decodes every assigned
cell of every scale back to an absolute box, and writes side-by-side
overlays (annotation boxes in white, decoded-target boxes in color) so the
9-cell encoding can be inspected visually.

Usage:
  python tools/visualize_y_true.py --annotation data/val.txt \
      --classes configs/coco_classes.txt --out /tmp/ytrue --num 4
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


def decode_y_true_layer(y_true, anchors, input_hw):
    """All assigned cells -> (boxes xywh, classes) in canvas pixels."""
    gh, gw, _ = y_true.shape
    na = len(anchors)
    js, is_ = np.where(y_true[..., 4] > 0.5)
    boxes, classes = [], []
    sh, sw = input_hw[0] / gh, input_hw[1] / gw
    for j, i in zip(js, is_):
        cell = y_true[j, i]
        cx = (cell[0] + i) * sw
        cy = (cell[1] + j) * sh
        anchor = anchors[int(np.argmax(cell[5:5 + na]))]
        w, h = np.exp(cell[2:4]) * anchor
        boxes.append([cx - w / 2, cy - h / 2, w, h])
        classes.append(int(np.argmax(cell[5 + na:])))
    return (np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(classes, np.int32))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--annotation', required=True)
    p.add_argument('--classes', required=True)
    p.add_argument('--anchors', default=None)
    p.add_argument('--input-size', type=int, default=416)
    p.add_argument('--num', type=int, default=4)
    p.add_argument('--augment', action='store_true')
    p.add_argument('--out', default='output/ytrue_viz')
    args = p.parse_args()

    lines = load_annotation_lines(args.annotation, shuffle=False)[:args.num]
    class_names = load_classes(args.classes)
    anchors = load_anchors(args.anchors)
    hw = (args.input_size, args.input_size)
    gen = MultiGridDataGenerator(
        lines, anchors, len(class_names), hw, batch_size=len(lines),
        augment={'enabled': args.augment, 'mosaic_prob': 0.0,
                 'mixup_prob': 0.0},
        train=args.augment, drop_remainder=False)
    images, y_true, aug_boxes = next(iter(gen))
    images = np.asarray(images)
    colors = get_colors(len(class_names))
    os.makedirs(args.out, exist_ok=True)
    for b in range(images.shape[0]):
        img = (images[b] * 255).astype(np.uint8)
        for l, yt in enumerate(y_true):
            boxes, classes = decode_y_true_layer(
                np.asarray(yt[b]), anchors[l], hw)
            if len(boxes):
                img = draw_boxes(img, boxes, classes, np.ones(len(boxes)),
                                 class_names, colors, show_scores=False)
        # original annotation boxes in white
        ab = np.asarray(aug_boxes[b])
        valid = (ab[:, 2] - ab[:, 0]) > 0
        ann = np.stack([ab[valid, 0], ab[valid, 1],
                        ab[valid, 2] - ab[valid, 0],
                        ab[valid, 3] - ab[valid, 1]], -1)
        img = draw_boxes(img, ann, ab[valid, 4].astype(int),
                         np.ones(valid.sum()), class_names,
                         [(255, 255, 255)] * len(class_names),
                         show_scores=False)
        path = os.path.join(args.out, f'ytrue_{b}.png')
        Image.fromarray(img).save(path)
        print(f'wrote {path}')


if __name__ == '__main__':
    main()
