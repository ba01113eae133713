#!/usr/bin/env python3
"""K-means anchor generation from annotation files.

The reference consumes anchor txt files (`w,h w,h w,h` per scale line) but
ships no way to produce them for a custom dataset; this closes that loop.
Clusters GT (w, h) pairs with k-means under the 1 - IoU(w,h) distance
(the YOLO anchor recipe) and writes the reference's anchor file format,
largest scale first.

Usage:
  python tools/compute_anchors.py --annotation data/train.txt \
      --num-anchors 9 --scales 3 --input-size 608 --out anchors.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def iou_wh(wh: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """IoU between [N,2] boxes and [K,2] centers sharing a corner."""
    inter = (np.minimum(wh[:, None, 0], centers[None, :, 0])
             * np.minimum(wh[:, None, 1], centers[None, :, 1]))
    union = (wh[:, 0] * wh[:, 1])[:, None] + \
        (centers[:, 0] * centers[:, 1])[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def kmeans_anchors(wh: np.ndarray, k: int, iters: int = 300,
                   seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    centers = wh[rng.choice(len(wh), k, replace=False)].astype(np.float64)
    assign = np.zeros(len(wh), np.int64) - 1
    for _ in range(iters):
        new_assign = np.argmax(iou_wh(wh, centers), axis=1)
        if (new_assign == assign).all():
            break
        assign = new_assign
        for j in range(k):
            sel = wh[assign == j]
            if len(sel):
                centers[j] = np.median(sel, axis=0)
    return centers[np.argsort(centers[:, 0] * centers[:, 1])]


def collect_wh(annotation_path: str, input_size: int) -> np.ndarray:
    """GT (w, h) in letterboxed model-canvas pixels."""
    from PIL import Image
    from multigriddet_tpu.data.annotations import parse_annotation_line
    whs = []
    with open(annotation_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            path, boxes = parse_annotation_line(line)
            if not len(boxes):
                continue
            try:
                with Image.open(path) as img:
                    iw, ih = img.size
            except OSError:
                continue
            scale = min(input_size / iw, input_size / ih)
            w = (boxes[:, 2] - boxes[:, 0]) * scale
            h = (boxes[:, 3] - boxes[:, 1]) * scale
            whs.append(np.stack([w, h], -1))
    if not whs:
        raise SystemExit('no boxes found')
    wh = np.concatenate(whs)
    return wh[(wh[:, 0] > 1) & (wh[:, 1] > 1)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--annotation', required=True)
    p.add_argument('--num-anchors', type=int, default=9)
    p.add_argument('--scales', type=int, default=3,
                   help='anchor file lines (coarse scale first)')
    p.add_argument('--input-size', type=int, default=608)
    p.add_argument('--out', default='anchors.txt')
    args = p.parse_args()

    wh = collect_wh(args.annotation, args.input_size)
    centers = kmeans_anchors(wh, args.num_anchors)
    mean_iou = float(np.mean(np.max(iou_wh(wh, centers), axis=1)))
    print(f'{len(wh)} boxes -> {args.num_anchors} anchors, '
          f'mean best-IoU {mean_iou:.3f}')
    if args.num_anchors % args.scales:
        p.error(f'--num-anchors {args.num_anchors} must be divisible by '
                f'--scales {args.scales}; otherwise anchors would be '
                'silently dropped from the output file')
    per_line = args.num_anchors // args.scales
    lines = []
    # largest anchors on the first (coarsest) line, reference convention
    ordered = centers[::-1]
    for s in range(args.scales):
        group = ordered[s * per_line:(s + 1) * per_line]
        lines.append(', '.join(f'{w:.0f},{h:.0f}' for w, h in group))
    with open(args.out, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print(f'wrote {args.out}:')
    print('\n'.join(lines))


if __name__ == '__main__':
    main()
