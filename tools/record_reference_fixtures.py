#!/usr/bin/env python3
"""Record golden fixtures from the ACTUAL reference implementation.

Runs the reference's own TF/NumPy code (under TF 2.21 on this host) on
deterministic synthetic inputs and dumps the outputs as ``.npz`` fixtures
into ``tests/fixtures/reference/``.  ``tests/test_reference_parity.py``
then pins the JAX implementations to these recordings.

Recorded surfaces (reference file:line):
  * 9-cell target encoder  — multigriddet/data/generators.py:2696-3390
    (``tf_preprocess_true_boxes``) and the NumPy original at 3393-3473.
  * MultiGridLoss          — multigriddet/losses/multigrid_loss.py:233-443
    (options 1/2/3, ignore mask, IoU-aware objectness, trainable-NMS,
    consensus, normalization modes, focal/softmax/class-weights).
  * Decoder + NMS          — multigriddet/postprocess/multigrid_decode.py:
    100-320 and postprocess/nms.py:389-407.
  * Photometric ops        — multigriddet/data/generators.py:260-344
    (deterministic ``tf.image.adjust_*`` cores of the random wrappers).

The reference imports ``imgaug`` at module scope but only uses it inside
legacy augmentation functions we never call; a stub module unblocks the
import (the package is not installed here).

Determinism: everything is seeded; fixtures are committed so the parity
tests do NOT need TF at test time.
"""

import json
import os
import sys
import types

import numpy as np

REFERENCE = '/root/reference'
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       'tests', 'fixtures', 'reference')

# ---------------------------------------------------------------- imgaug stub
_ia = types.ModuleType('imgaug')
_iaa = types.ModuleType('imgaug.augmenters')
_ia.augmenters = _iaa
_ia.ALL = 'ALL'
sys.modules.setdefault('imgaug', _ia)
sys.modules.setdefault('imgaug.augmenters', _iaa)
sys.path.insert(0, REFERENCE)

import tensorflow as tf  # noqa: E402

from multigriddet.data.generators import (  # noqa: E402
    preprocess_true_boxes, tf_preprocess_true_boxes)
from multigriddet.losses.multigrid_loss import MultiGridLoss  # noqa: E402
from multigriddet.postprocess.multigrid_decode import MultiGridDecoder  # noqa: E402
from multigriddet.postprocess.nms import nms_boxes  # noqa: E402

# Shared problem setup: 416x416 canvas (square — the reference's row/col
# swap quirk is a no-op on square grids, so outputs are directly
# comparable with the axis-correct JAX encoder), COCO anchor table,
# 8 classes to keep fixtures small.
INPUT_HW = (416, 416)
GRIDS = [(13, 13), (26, 26), (52, 52)]
NUM_CLASSES = 8
ANCHORS = [
    np.array([[112, 74], [149, 190], [370, 328]], np.float32),
    np.array([[28, 17], [56, 112], [57, 35]], np.float32),
    np.array([[9, 10], [13, 28], [28, 55]], np.float32),
]


def make_boxes():
    """Deterministic (3, 10, 5) x1y1x2y2c boxes covering the edge cases."""
    B, N = 3, 10
    boxes = np.zeros((B, N, 5), np.float32)
    # img0: three well-separated boxes of very different scales
    boxes[0, 0] = [40, 60, 340, 340, 2]      # large -> layer 0
    boxes[0, 1] = [200, 30, 260, 130, 5]     # medium -> layer 1
    boxes[0, 2] = [10, 380, 22, 405, 7]      # small -> layer 2
    # img1: crowded scene — same-cell centers exercise the occupancy rule
    boxes[1, 0] = [100, 100, 160, 160, 1]
    boxes[1, 1] = [104, 104, 164, 164, 3]    # center in the same 16px cell
    boxes[1, 2] = [98, 98, 162, 158, 4]      # and again
    boxes[1, 3] = [300, 300, 390, 405, 0]
    boxes[1, 4] = [305, 290, 395, 400, 6]
    boxes[1, 5] = [50, 250, 60, 270, 2]
    boxes[1, 6] = [52, 252, 62, 272, 2]      # near-duplicate tiny box
    boxes[1, 7] = [208, 208, 224, 224, 5]    # 16x16 — IoL tie candidates
    # img2: boundary boxes + padding rows
    boxes[2, 0] = [0, 0, 120, 90, 0]         # touches origin
    boxes[2, 1] = [300, 340, 416, 416, 4]    # touches far edge
    boxes[2, 2] = [192, 192, 224, 224, 1]    # center exactly on cell corner
    return boxes


def record_encoder(boxes):
    anchors_tf = [tf.constant(a) for a in ANCHORS]
    y_true = tf_preprocess_true_boxes(
        tf.constant(boxes), INPUT_HW, anchors_tf, NUM_CLASSES,
        False, GRIDS)
    y_true = [np.asarray(t, np.float32) for t in y_true]
    # NumPy original too, as a second, independent recording.
    y_np = preprocess_true_boxes(boxes, INPUT_HW, ANCHORS, NUM_CLASSES,
                                 multi_anchor_assign=False,
                                 grid_shapes=GRIDS)
    y_np = [np.asarray(t, np.float32) for t in y_np]
    np.savez_compressed(
        os.path.join(OUT_DIR, 'encoder.npz'),
        boxes=boxes,
        **{f'tf_l{l}': y_true[l] for l in range(len(y_true))},
        **{f'np_l{l}': y_np[l] for l in range(len(y_np))})
    return y_true


def make_logits(rng, y_true):
    """Seeded logits with crafted near-GT duplicates for the ignore mask."""
    preds = []
    for l, t in enumerate(y_true):
        b, gh, gw, ch = t.shape
        p = rng.standard_normal((b, gh, gw, ch)).astype(np.float32) * 1.5
        preds.append(p)
    # Plant duplicate detections: at cells adjacent to GT centers, set wh
    # logits to the GT log-ratio, xy logit to 0 (cell center), obj logit
    # high.  These decode to boxes with IoU > ignore_thresh against GT,
    # exercising the ignore mask and the trainable-NMS penalty.
    for l, (t, p) in enumerate(zip(y_true, preds)):
        obj = t[..., 4]
        txy = t[..., 0:2]
        center = ((txy[..., 0] >= 0) & (txy[..., 0] < 1)
                  & (txy[..., 1] >= 0) & (txy[..., 1] < 1) & (obj > 0.5))
        bs, js, is_ = np.nonzero(center)
        for bb, jj, ii in zip(bs, js, is_):
            jj2, ii2 = jj, min(ii + 2, t.shape[2] - 1)
            if center[bb, jj2, ii2]:
                continue
            p[bb, jj2, ii2, 0:2] = 0.0                      # xy -> cell center
            p[bb, jj2, ii2, 2:4] = t[bb, jj, ii, 2:4]       # matching wh
            p[bb, jj2, ii2, 4] = 4.0                        # confident dupe
    return preds


LOSS_CONFIGS = {
    'opt1': dict(loss_option=1),
    'opt2': dict(loss_option=2),
    'opt3_giou': dict(loss_option=3, use_giou_loss=True),
    'opt3_diou': dict(loss_option=3, use_diou_loss=True),
    'opt3_ciou': dict(loss_option=3, use_ciou_loss=True),
    'opt2_focal': dict(loss_option=2, use_focal_loss=True,
                       focal_alpha=0.25, focal_gamma=2.0),
    'opt2_softmax': dict(loss_option=2, use_softmax_loss=True),
    'opt2_smooth_cw': dict(loss_option=2, label_smoothing=0.1,
                           class_weights=np.linspace(
                               0.5, 2.0, NUM_CLASSES).astype(np.float32)),
    'opt2_iouaware_tnms': dict(loss_option=2, use_iou_aware_objectness=True,
                               iou_objectness_power=1.5,
                               iou_objectness_ratio=0.8,
                               trainable_nms_weight=1.0,
                               trainable_nms_power=2.0),
    'opt2_consensus': dict(loss_option=2, use_consensus_loss=True,
                           consensus_kernel_size=3,
                           consensus_iou_power=1.5,
                           consensus_min_iou=1e-3,
                           consensus_coord_scale=0.5,
                           consensus_obj_scale=0.5,
                           consensus_class_scale=0.3),
    'opt2_norm_positives': dict(loss_option=2,
                                loss_normalization=['positives']),
    'opt2_norm_grid': dict(loss_option=2, loss_normalization=['grid']),
    'opt2_scales': dict(loss_option=2, coord_scale=5.0, object_scale=2.0,
                        no_object_scale=0.5, class_scale=2.0),
    'opt2_anchor_scale': dict(loss_option=2, anchor_scale=1.7),
    'opt2_ignore_hi': dict(loss_option=2, ignore_thresh=0.3),
}


def record_losses(y_true, y_pred):
    y_true_tf = [tf.constant(t) for t in y_true]
    y_pred_tf = [tf.constant(p) for p in y_pred]
    values = {}
    for name, kw in LOSS_CONFIGS.items():
        loss = MultiGridLoss(ANCHORS, NUM_CLASSES, INPUT_HW, **kw)
        try:
            total = loss.compute_loss(y_true_tf, y_pred_tf)
            values[name] = float(np.asarray(total))
            print(f'  loss[{name}] = {values[name]:.6f}')
        except Exception as exc:  # reference option-3 crashes as shipped
            values[name] = {'reference_error': f'{type(exc).__name__}'}
            print(f'  loss[{name}] = REFERENCE RAISES {type(exc).__name__}')
    np.savez_compressed(
        os.path.join(OUT_DIR, 'loss.npz'),
        **{f'pred_l{l}': y_pred[l] for l in range(len(y_pred))},
        **{f'true_l{l}': y_true[l] for l in range(len(y_true))})
    with open(os.path.join(OUT_DIR, 'loss_values.json'), 'w') as f:
        json.dump(values, f, indent=1, sort_keys=True)
    return values


def record_decoder(y_pred):
    out = {}
    for sm in (True, False):
        dec = MultiGridDecoder(ANCHORS, NUM_CLASSES, INPUT_HW,
                               rescore_confidence=True, use_softmax=sm)
        decoded = dec.decode_predictions([p.copy() for p in y_pred])
        out[f'decoded_softmax{int(sm)}'] = decoded.astype(np.float32)
    # Full postprocess on a letterboxed 480x640 source image, DIoU NMS.
    dec = MultiGridDecoder(ANCHORS, NUM_CLASSES, INPUT_HW,
                           rescore_confidence=True, use_softmax=True)
    for b in range(y_pred[0].shape[0]):
        boxes, classes, scores = dec.postprocess(
            [p[b:b + 1] for p in y_pred], image_shape=(480, 640),
            model_image_size=INPUT_HW, max_boxes=100, confidence=0.3,
            nms_threshold=0.5, use_iol=True, nms_method='diou',
            return_xyxy=True)
        out[f'post_boxes_{b}'] = np.asarray(boxes, np.float32).reshape(-1, 4)
        out[f'post_classes_{b}'] = np.asarray(classes, np.int32).reshape(-1)
        out[f'post_scores_{b}'] = np.asarray(scores, np.float32).reshape(-1)
        print(f'  postprocess img{b}: {out[f"post_boxes_{b}"].shape[0]} boxes')
    np.savez_compressed(os.path.join(OUT_DIR, 'decoder.npz'), **out)


def record_nms(rng):
    """Standalone NMS sweeps on synthetic clustered xywh boxes."""
    n = 40
    centers = rng.uniform(40, 360, (8, 2))
    idx = rng.integers(0, 8, n)
    xy = centers[idx] + rng.normal(0, 6, (n, 2))
    wh = rng.uniform(20, 90, (n, 2))
    boxes = np.concatenate([xy - wh / 2, wh], -1).astype(np.float32)  # x,y,w,h
    classes = (idx % 3).astype(np.int64)
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
    out = {'in_boxes': boxes, 'in_classes': classes.astype(np.int32),
           'in_scores': scores}
    variants = {
        'std_iol': dict(use_iol=True, use_diou=False),
        'std_iou': dict(use_iol=False, use_diou=False),
        'diou': dict(use_iol=False, use_diou=True),
        'diou_iol': dict(use_iol=True, use_diou=True),
        'soft': dict(use_iol=False, is_soft=True),
    }
    for name, kw in variants.items():
        b, c, s = nms_boxes(boxes.copy(), classes.copy(), scores.copy(),
                            nms_threshold=0.5, confidence=0.35, **kw)
        out[f'{name}_boxes'] = np.asarray(b, np.float32).reshape(-1, 4)
        out[f'{name}_classes'] = np.asarray(c, np.int32).reshape(-1)
        out[f'{name}_scores'] = np.asarray(s, np.float32).reshape(-1)
        print(f'  nms[{name}]: kept {out[f"{name}_boxes"].shape[0]}')
    np.savez_compressed(os.path.join(OUT_DIR, 'nms.npz'), **out)


def make_wbf_scenarios(rng):
    """Synthetic detection sets for pinning WeightedBoxesFusion
    (reference postprocess/wbf.py:11-290).

    Boxes are top-left xywh in pixels on a 416x416 canvas.  Each scenario
    is (boxes, classes, scores, models, kwargs):

    * clustered — the NMS-style clustered set: 8 Gaussian clusters, 3
      classes; the bread-and-butter single-model case (conf_type 'avg').
    * maxconf   — same set with conf_type='max'.
    * chain     — a chain of partial overlaps (A~B, B~C, but not A~C at
      the threshold): exposes the seed-vs-running-average clustering
      difference between the reference and the paper formulation.
    * ties      — exact duplicate scores: pins the reference's
      np.argsort(scores)[::-1] tie ordering.
    * skipthr   — skip_box_thr=0.3 drops the tail before clustering.
    * ensemble  — two models with weights [2.0, 1.0] and
      conf_type='box_and_model_avg' through the multi-list API.
    * allskip   — every score below skip_box_thr: the empty return path.
    """
    scen = {}
    n = 40
    centers = rng.uniform(40, 360, (8, 2))
    idx = rng.integers(0, 8, n)
    xy = centers[idx] + rng.normal(0, 6, (n, 2))
    wh = rng.uniform(20, 90, (n, 2))
    boxes = np.concatenate([xy - wh / 2, wh], -1).astype(np.float32)
    classes = (idx % 3).astype(np.int64)
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
    scen['clustered'] = (boxes, classes, scores, None,
                         dict(iou_thr=0.55, skip_box_thr=0.0,
                              conf_type='avg'))
    scen['maxconf'] = (boxes, classes, scores, None,
                       dict(iou_thr=0.55, skip_box_thr=0.0,
                            conf_type='max'))
    # chain with the TOP score in the middle: the reference seeds at B
    # (x=50) and absorbs both A (IoU 0.333) and C (IoU 0.379) into ONE
    # cluster; the paper mode's representative drifts toward A after the
    # first join ([26.5, 126.5]) and then rejects C (IoU 0.187 < 0.3),
    # yielding TWO clusters — the modes genuinely diverge here.
    cb = np.asarray([[0.0, 100.0, 100.0, 80.0],
                     [50.0, 100.0, 100.0, 80.0],
                     [95.0, 100.0, 100.0, 80.0],
                     [300.0, 100.0, 100.0, 80.0],
                     [330.0, 100.0, 100.0, 80.0]], np.float32)
    cs = np.asarray([0.8, 0.9, 0.7, 0.6, 0.5], np.float32)
    scen['chain'] = (cb, np.zeros(5, np.int64), cs, None,
                     dict(iou_thr=0.3, skip_box_thr=0.0, conf_type='avg'))
    tb = np.asarray([[50, 50, 60, 60], [55, 52, 62, 58], [52, 48, 58, 64],
                     [200, 200, 40, 40], [204, 198, 44, 38]], np.float32)
    scen['ties'] = (tb, np.zeros(5, np.int64),
                    np.asarray([0.7, 0.7, 0.7, 0.5, 0.5], np.float32),
                    None,
                    dict(iou_thr=0.4, skip_box_thr=0.0, conf_type='avg'))
    scen['skipthr'] = (boxes, classes, scores, None,
                       dict(iou_thr=0.55, skip_box_thr=0.3,
                            conf_type='avg'))
    models = (rng.uniform(size=n) < 0.5).astype(np.int64)
    scen['ensemble'] = (boxes, classes, scores, models,
                        dict(iou_thr=0.55, skip_box_thr=0.0,
                             conf_type='box_and_model_avg',
                             weights=[2.0, 1.0]))
    scen['allskip'] = (boxes[:4], classes[:4],
                       np.full(4, 0.1, np.float32), None,
                       dict(iou_thr=0.55, skip_box_thr=0.5,
                            conf_type='avg'))
    return scen


def record_wbf(rng):
    """Run the reference's WeightedBoxesFusion on the scenarios."""
    from multigriddet.postprocess.wbf import WeightedBoxesFusion
    out = {}
    meta = {}
    for name, (boxes, classes, scores, models, kw) in \
            make_wbf_scenarios(rng).items():
        weights = kw.pop('weights', None)
        wbf = WeightedBoxesFusion(**kw)
        if models is None:
            blist, clist, slist = [boxes], [classes], [scores]
        else:
            blist = [boxes[models == m] for m in range(2)]
            clist = [classes[models == m] for m in range(2)]
            slist = [scores[models == m] for m in range(2)]
        fb, fc, fs = wbf.fuse_boxes(blist, clist, slist, (416, 416),
                                    weights=weights)
        fb = (np.concatenate(fb) if len(fb)
              else np.zeros((0, 4))).astype(np.float32)
        fc = (np.concatenate(fc) if len(fc)
              else np.zeros((0,))).astype(np.int32)
        fs = (np.concatenate(fs) if len(fs)
              else np.zeros((0,))).astype(np.float32)
        out[f'{name}_in_boxes'] = boxes
        out[f'{name}_in_classes'] = classes.astype(np.int32)
        out[f'{name}_in_scores'] = scores
        if models is not None:
            out[f'{name}_in_models'] = models.astype(np.int32)
        out[f'{name}_boxes'] = fb
        out[f'{name}_classes'] = fc
        out[f'{name}_scores'] = fs
        kw['weights'] = weights
        meta[name] = {k: v for k, v in kw.items() if v is not None}
        print(f'  wbf[{name}]: {len(boxes)} in -> {len(fb)} fused')
    np.savez_compressed(os.path.join(OUT_DIR, 'wbf.npz'), **out)
    with open(os.path.join(OUT_DIR, 'wbf_configs.json'), 'w') as f:
        json.dump(meta, f, indent=1)


def record_photometric(rng):
    """Deterministic cores of generators.py:260-344 (tf.image.adjust_*)."""
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    img01 = tf.constant(img / 255.0)

    def clip255(x):
        return np.asarray(tf.clip_by_value(x, 0.0, 1.0) * 255.0, np.float32)

    out = {'image': img}
    for d in (-0.2, 0.15):
        out[f'brightness_{d}'] = clip255(tf.image.adjust_brightness(img01, d))
    for c in (0.8, 1.3):
        out[f'contrast_{c}'] = clip255(tf.image.adjust_contrast(img01, c))
    for s in (0.7, 1.4):
        out[f'saturation_{s}'] = clip255(tf.image.adjust_saturation(img01, s))
    for h in (-0.1, 0.08):
        out[f'hue_{h}'] = clip255(tf.image.adjust_hue(img01, h))
    gray = tf.image.grayscale_to_rgb(tf.image.rgb_to_grayscale(img01))
    out['grayscale'] = clip255(gray)
    np.savez_compressed(os.path.join(OUT_DIR, 'photometric.npz'), **out)
    print(f'  photometric: {len(out) - 1} outputs')


def make_map_scenarios():
    """Synthetic prediction/GT sets for pinning calculate_map
    (reference evaluation/metrics.py:529-814).

    Five classes.  Data is stored flat, grouped by ascending image id with
    within-image order preserved — insertion order matters because the
    reference tie-breaks score ties by np.argsort order.
    Scenarios:
      crowded — 3 images, clustered GTs, overlapping preds, deliberate
                score ties (scores quantized to 1 decimal).
      absent  — class 0 GT-only, class 1 pred-only, class 2/4 both,
                class 3 inactive.
      sizes   — small/<32^2, medium, large mix to pin APS/APM/APL (the
                reference computes these with its UNCACHED matching path,
                whose BoxUtils.box_iou misreads xyxy as center-format —
                utils/boxes.py:27-37; recorded as-is).
    """
    rng = np.random.default_rng(20260817)
    scenarios = {}

    def jitter(box, s):
        x1, y1, x2, y2 = box
        dx, dy = rng.normal(0, s, 2)
        g = rng.normal(1.0, 0.08)
        w, h = (x2 - x1) * g, (y2 - y1) * g
        return [x1 + dx, y1 + dy, x1 + dx + w, y1 + dy + h]

    # -- crowded ------------------------------------------------------
    pred, gt = [], []
    for img in range(3):
        centers = rng.uniform(60, 560, (4, 2))
        for k in range(12):
            c = centers[k % 4] + rng.normal(0, 18, 2)
            w, h = rng.uniform(30, 120, 2)
            box = [c[0] - w / 2, c[1] - h / 2, c[0] + w / 2, c[1] + h / 2]
            cls = int(rng.integers(0, 5))
            gt.append((img, box, cls))
            # 2 candidate detections per GT + noise FPs below
            for _ in range(2):
                if rng.uniform() < 0.8:
                    pred.append((img, jitter(box, 6), cls,
                                 round(float(rng.uniform(0.3, 1.0)), 1)))
        for _ in range(6):   # unmatched false positives
            c = rng.uniform(40, 580, 2)
            w, h = rng.uniform(20, 80, 2)
            pred.append((img, [c[0], c[1], c[0] + w, c[1] + h],
                         int(rng.integers(0, 5)),
                         round(float(rng.uniform(0.3, 0.9)), 1)))
    scenarios['crowded'] = (pred, gt)

    # -- absent classes ----------------------------------------------
    pred, gt = [], []
    for img in range(2):
        gt.append((img, [50, 50, 150, 160], 0))            # GT-only class
        pred.append((img, [200, 40, 260, 120], 1, 0.8))    # pred-only class
        box2 = [300.0 + img * 7, 300.0, 420.0, 430.0]
        gt.append((img, box2, 2))
        pred.append((img, jitter(box2, 3), 2, 0.9))
        pred.append((img, jitter(box2, 30), 2, 0.9))       # tie score dupe
        box4 = [80.0, 350.0, 180.0, 460.0]
        gt.append((img, box4, 4))
        if img == 0:
            pred.append((img, jitter(box4, 4), 4, 0.6))
    scenarios['absent'] = (pred, gt)

    # -- sizes --------------------------------------------------------
    pred, gt = [], []
    sides = {'s': (8, 24), 'm': (40, 90), 'l': (110, 300)}
    for img in range(2):
        for key, (lo, hi) in sides.items():
            for _ in range(4):
                w, h = rng.uniform(lo, hi, 2)
                x1, y1 = rng.uniform(0, 600 - hi, 2)
                box = [x1, y1, x1 + w, y1 + h]
                cls = int(rng.integers(0, 5))
                gt.append((img, box, cls))
                if rng.uniform() < 0.85:
                    pred.append((img, jitter(box, max(1.0, w * 0.06)), cls,
                                 round(float(rng.uniform(0.3, 1.0)), 2)))
        pred.append((img, [5, 5, 17, 19], int(rng.integers(0, 5)), 0.55))
    scenarios['sizes'] = (pred, gt)
    return scenarios


def record_map():
    """Record reference calculate_map outputs on the synthetic scenarios."""
    from multigriddet.evaluation.metrics import calculate_map
    scenarios = make_map_scenarios()
    arrays, values = {}, {}
    thresholds = [0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95]
    for name, (pred, gt) in scenarios.items():
        arrays[f'{name}_pred_img'] = np.array([p[0] for p in pred], np.int64)
        arrays[f'{name}_pred_box'] = np.array([p[1] for p in pred],
                                              np.float64)
        arrays[f'{name}_pred_cls'] = np.array([p[2] for p in pred], np.int64)
        arrays[f'{name}_pred_score'] = np.array([p[3] for p in pred],
                                                np.float64)
        arrays[f'{name}_gt_img'] = np.array([g[0] for g in gt], np.int64)
        arrays[f'{name}_gt_box'] = np.array([g[1] for g in gt], np.float64)
        arrays[f'{name}_gt_cls'] = np.array([g[2] for g in gt], np.int64)
        ref_pred = [{'bbox': list(map(float, p[1])), 'class': int(p[2]),
                     'score': float(p[3]), 'image_id': int(p[0])}
                    for p in pred]
        ref_gt = [{'bbox': list(map(float, g[1])), 'class': int(g[2]),
                   'image_id': int(g[0])} for g in gt]
        runs = {'coco': dict(method='coco', cache_ious=True),
                'voc': dict(method='voc', cache_ious=True),
                'coco_nocache': dict(method='coco', cache_ious=False)}
        for run_name, kw in runs.items():
            res = calculate_map(
                predictions=ref_pred, ground_truths=ref_gt, num_classes=5,
                iou_thresholds=list(thresholds), use_parallel=False,
                optimize_classes=True, compute_per_scale=True, **kw)
            values[f'{name}/{run_name}'] = {
                k: (float(v) if isinstance(v, (int, float, np.floating))
                    else {kk: ({k3: float(v3) for k3, v3 in vv.items()}
                               if isinstance(vv, dict) else float(vv))
                          for kk, vv in v.items()})
                for k, v in res.items()}
            print(f'  map[{name}/{run_name}]: mAP={res["mAP"]:.6f} '
                  f'mAP50={res["mAP50"]:.6f} APS={res["APS"]:.6f} '
                  f'APM={res["APM"]:.6f} APL={res["APL"]:.6f}')
    np.savez_compressed(os.path.join(OUT_DIR, 'map.npz'), **arrays)
    with open(os.path.join(OUT_DIR, 'map_values.json'), 'w') as f:
        json.dump(values, f, indent=1, sort_keys=True)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    if 'map' in sys.argv[1:]:
        print('recording mAP fixtures only...')
        record_map()
        print('done ->', OUT_DIR)
        return
    if 'wbf' in sys.argv[1:]:
        print('recording WBF fixtures only...')
        # dedicated stream: must not perturb the shared rng sequence the
        # other stages consume (their fixtures are already committed)
        record_wbf(np.random.default_rng(20260818))
        print('done ->', OUT_DIR)
        return
    tf.random.set_seed(0)
    rng = np.random.default_rng(20260816)

    boxes = make_boxes()
    print('recording encoder fixtures...')
    y_true = record_encoder(boxes)
    print('recording loss fixtures...')
    y_pred = make_logits(rng, y_true)
    record_losses(y_true, y_pred)
    print('recording decoder fixtures...')
    record_decoder(y_pred)
    print('recording nms fixtures...')
    record_nms(rng)
    print('recording photometric fixtures...')
    record_photometric(rng)
    print('recording wbf fixtures...')
    record_wbf(np.random.default_rng(20260818))
    print('recording mAP fixtures...')
    record_map()

    manifest = {
        'input_hw': INPUT_HW, 'grids': GRIDS, 'num_classes': NUM_CLASSES,
        'anchors': [a.tolist() for a in ANCHORS],
        'loss_configs': {k: {kk: (vv.tolist() if isinstance(vv, np.ndarray)
                                  else vv) for kk, vv in v.items()}
                         for k, v in LOSS_CONFIGS.items()},
        'tf_version': tf.__version__,
    }
    with open(os.path.join(OUT_DIR, 'manifest.json'), 'w') as f:
        json.dump(manifest, f, indent=1)
    print('done ->', OUT_DIR)


if __name__ == '__main__':
    main()
