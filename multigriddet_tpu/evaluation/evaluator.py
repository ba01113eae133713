"""MultiGridEvaluator: batched on-device inference + host mAP.

TPU-native counterpart of the reference evaluator
(/root/reference/multigriddet/evaluation/evaluator.py:37-654).  The
reference runs the model on device, then a thread-pooled NumPy
decode + NMS per image on the host (its eval hot spot); here decode + NMS
are fused into the batched jitted forward (make_infer_step), so the host
only does letterboxing, the tiny box-count letterbox inverse, and mAP.

Keeps the reference's phase timing (inference vs metrics wall time,
images/sec) and JSON results schema.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..config import build_model_from_config, resolve_compute_dtype
from ..data.annotations import (load_annotation_lines,
                                parse_annotation_line)
from ..ops.geometry import canvas_boxes_to_image
from ..training.checkpoint import load_weights_flexible
from ..training.steps import fetch_detections, make_infer_step
from ..utils.visualization import draw_boxes, get_colors
from .metrics import (COCO_IOU_THRESHOLDS, calculate_map,
                      calculate_map_reference, format_results)


class MultiGridEvaluator:

    def __init__(self, config: Dict[str, Any]):
        self.config = config
        ev = config.get('evaluation', {}) or {}
        self.batch_size = int(ev.get('batch_size', 8))
        self.confidence = float(ev.get('confidence_threshold', 0.1))
        self.nms_threshold = float(ev.get('nms_threshold', 0.45))
        self.nms_method = ev.get('nms_method', 'diou')
        self.use_iol = bool(ev.get('use_iol', True))
        self.iou_thresholds = tuple(
            ev.get('iou_thresholds', COCO_IOU_THRESHOLDS))
        self.interp = ev.get('interpolation_method', 'coco')
        # 'native' = standard all-point COCO AP; 'reference' = the
        # reference's exact computation (trapz AP, pred-only classes in
        # the mean — see docs/PARITY.md #8-10) for apples-to-apples
        # comparisons with reference-produced numbers
        self.metrics_mode = ev.get('metrics_mode', 'native')
        self.max_images = ev.get('max_images')
        # per-image detection capacity; the reference evaluator decodes
        # with max_boxes=500 (reference evaluator.py:266, 573)
        self.max_detections = int(ev.get('max_detections', 500))
        self.use_wbf = bool(ev.get('use_wbf', False))
        self.wbf_mode = str(ev.get('wbf_mode', 'paper'))
        self.optimize_classes = bool(ev.get('optimize_classes', True))
        self.results_dir = ev.get('results_dir', 'results/evaluation')
        self.save_results = bool(ev.get('save_results', True))
        self.eval_cfg = ev
        self._load_model()
        self.results: Optional[Dict] = None
        self.timing: Dict[str, float] = {}

    def _load_model(self):
        # bfloat16 compute by default (environment.mixed_precision), like
        # the reference's mixed-precision evaluator (ref evaluator.py:50-54)
        self.compute_dtype = resolve_compute_dtype(self.config,
                                                   default_mixed=True)
        self.model, self.spec = build_model_from_config(
            self.config, dtype=self.compute_dtype)
        ev = self.config.get('evaluation', {}) or {}
        shape = ev.get('input_shape') or self.spec['input_shape']
        self.input_hw: Tuple[int, int] = tuple(shape[:2])
        self.class_names = self.spec.get('class_names') or [
            str(i) for i in range(self.spec['num_classes'])]
        dummy = jnp.zeros((1, *self.input_hw, 3), jnp.float32)
        variables = jax.jit(lambda: self.model.init(
            jax.random.PRNGKey(0), dummy, train=False))()
        weights_path = self.config.get('weights_path')
        if weights_path and os.path.exists(weights_path):
            # bundle or bare-params file, both accepted
            params, batch_stats = load_weights_flexible(
                weights_path, variables['params'],
                variables.get('batch_stats', {}))
            variables = {'params': params, 'batch_stats': batch_stats}
            print(f'Loaded weights from {weights_path}')
        else:
            print('WARNING: evaluating with random weights')
        self.variables = variables
        # pixel transport (evaluation.link_format): 'auto' ships planar
        # YCbCr 4:2:0 (half the host->device bytes; round trip errs
        # less than one JPEG re-save, ops/yuv.py) when the canvas is
        # even — on a tunneled link the eval loop is transfer-bound, so
        # this is ~2x throughput.  'rgb' keeps the byte-exact transport.
        lf = str(ev.get('link_format', 'auto'))
        if lf == 'auto':
            even = self.input_hw[0] % 2 == 0 and self.input_hw[1] % 2 == 0
            lf = 'yuv420' if even else 'rgb'
        self.link_format = lf
        self._infer = make_infer_step(
            self.model, self.spec['anchors'], self.input_hw,
            confidence=self.confidence, nms_threshold=self.nms_threshold,
            nms_method=self.nms_method, use_iol=self.use_iol,
            max_boxes=self.max_detections,
            nms_backend=ev.get('nms_backend', 'xla'),
            pre_nms_top_k=int(ev.get('pre_nms_top_k', 1024)),
            use_wbf=self.use_wbf, link_format=self.link_format,
            )  # tuple outputs; fetch_detections does one batched get

    def _load_annotations(self, path: str):
        lines = load_annotation_lines(path, shuffle=False)
        if self.max_images:
            lines = lines[:int(self.max_images)]
        return lines

    # ------------------------------------------------------------------

    def evaluate(self, annotation_path: Optional[str] = None) -> Dict:
        data_cfg = self.config.get('data', {}) or {}
        path = annotation_path or data_cfg.get('annotation')
        lines = self._load_annotations(path)
        print(f'Evaluating {len(lines)} images @ {self.input_hw}')

        predictions: Dict[int, Dict] = {}
        ground_truths: Dict[int, Dict] = {}
        img_sizes: Dict[int, Tuple[int, int]] = {}

        t_infer = 0.0
        t0_all = time.time()
        annotated_cfg = ((self.config.get('visualizations', {}) or {})
                         .get('save_annotated_images', {}) or {})
        save_imgs = bool(annotated_cfg.get('enabled'))
        max_save = int(annotated_cfg.get('max_images', 10) or 0)
        colors = get_colors(len(self.class_names))
        n_saved = 0

        import queue
        import threading

        from ..data.annotations import HostImageLoader
        workers = int((self.config.get('evaluation', {}) or {})
                      .get('num_workers', 8))
        loader = HostImageLoader(lines, self.input_hw, max_boxes=1,
                                 num_workers=workers,
                                 link_format=self.link_format)
        q: 'queue.Queue' = queue.Queue(maxsize=2)

        def producer():
            try:
                for start in range(0, len(lines), self.batch_size):
                    chunk = lines[start:start + self.batch_size]
                    # decode+letterbox through the (native) loader; only
                    # the final short batch pays a pad-copy — re-copying
                    # EVERY batch into a fresh buffer first-touch-faults
                    # 33 MB/batch while transfers are in flight (the
                    # calloc pathology, native/fastloader.cpp; measured
                    # 14 -> >100 img/s on the 5k eval bench)
                    imgs_u8, _ = loader.load_batch(chunk)
                    parts = (imgs_u8 if isinstance(imgs_u8, tuple)
                             else (imgs_u8,))
                    if len(chunk) < self.batch_size:
                        padded = []
                        for p in parts:
                            buf = np.zeros(
                                (self.batch_size, *p.shape[1:]), p.dtype)
                            buf[:len(chunk)] = p
                            padded.append(buf)
                        parts = tuple(padded)
                    metas = []
                    for bi, line in enumerate(chunk):
                        img_path, gt_boxes = parse_annotation_line(line)
                        raw = None
                        failed = False
                        try:
                            with Image.open(img_path) as img:
                                iw, ih = img.size
                                if save_imgs and start + bi < max_save:
                                    raw = np.asarray(img.convert('RGB'))
                        except Exception as exc:
                            # the loader fed a gray canvas for this slot;
                            # count the image honestly (its GT becomes
                            # misses, its predictions empty — gray-canvas
                            # hallucinations must not enter mAP as FPs)
                            print(f'WARNING: cannot read {img_path} '
                                  f'({type(exc).__name__}); counting its '
                                  f'ground truth as missed')
                            ih, iw = self.input_hw
                            failed = True
                        metas.append((start + bi, gt_boxes, ih, iw, raw,
                                      failed))
                    q.put((parts, metas))
                q.put(None)
            except BaseException as exc:
                # propagate: a swallowed producer error would silently
                # report mAP over a truncated prefix as a complete run
                q.put(exc)

        threading.Thread(target=producer, daemon=True).start()

        # software pipeline (depth like the engine's detect_files): keep
        # a few batches in flight so the next batch's host->device
        # transfer and the device compute overlap this batch's
        # device->host fetch + host postprocess, instead of serializing
        # transfer -> compute -> fetch -> postprocess per batch
        from collections import deque
        depth = max(int(self.eval_cfg.get('pipeline_depth', 4)), 0)
        pending: 'deque' = deque()

        def drain_one():
            nonlocal t_infer, n_saved
            outs, metas = pending.popleft()
            t0 = time.time()
            bxs, cls, scs, valid = fetch_detections(outs)  # 1 batched get
            t_infer += time.time() - t0
            for bi, (img_id, gt_boxes, ih, iw, raw,
                     failed) in enumerate(metas):
                keep = valid[bi] if not failed else np.zeros_like(valid[bi])
                b, c, s = bxs[bi][keep], cls[bi][keep], scs[bi][keep]
                if self.use_wbf:
                    from ..postprocess.wbf import fuse_and_cap
                    b, c, s = fuse_and_cap(
                        b, c, s, iou_thr=self.nms_threshold,
                        mode=self.wbf_mode, max_out=self.max_detections)
                if len(b):
                    b = np.asarray(canvas_boxes_to_image(
                        b, (ih, iw), self.input_hw))
                predictions[img_id] = {
                    'boxes': b.astype(np.float32),
                    'classes': c.astype(np.int32),
                    'scores': s.astype(np.float32)}
                # GT: x1y1x2y2cls -> top-left xywh
                g = gt_boxes
                gt_xywh = (np.stack(
                    [g[:, 0], g[:, 1], g[:, 2] - g[:, 0],
                     g[:, 3] - g[:, 1]], axis=-1)
                    if len(g) else np.zeros((0, 4), np.float32))
                ground_truths[img_id] = {
                    'boxes': gt_xywh.astype(np.float32),
                    'classes': (g[:, 4].astype(np.int32) if len(g)
                                else np.zeros((0,), np.int32))}
                img_sizes[img_id] = (ih, iw)
                if raw is not None and n_saved < max_save:
                    self._save_annotated(raw, b, c, s, gt_xywh,
                                         ground_truths[img_id]['classes'],
                                         img_id, colors, annotated_cfg)
                    n_saved += 1

        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            parts, metas = item
            t0 = time.time()
            outs = self._infer(self.variables,
                               *(jnp.asarray(p) for p in parts))
            t_infer += time.time() - t0
            pending.append((outs, metas))
            if len(pending) > depth:
                drain_one()
        while pending:
            drain_one()

        self.timing['inference_s'] = t_infer
        n = len(lines)
        self.timing['images_per_sec'] = n / t_infer if t_infer > 0 else 0.0

        t0 = time.time()
        if self.metrics_mode == 'reference':
            results = calculate_map_reference(
                predictions, ground_truths, self.spec['num_classes'],
                self.iou_thresholds, self.interp, self.optimize_classes,
                self.class_names)
            results['gt_counts'] = np.array(
                [sum(int((g['classes'] == c).sum())
                     for g in ground_truths.values())
                 for c in range(self.spec['num_classes'])])
        else:
            results = calculate_map(
                predictions, ground_truths, self.spec['num_classes'],
                self.iou_thresholds, self.interp, self.optimize_classes,
                self.class_names,
                # default ON from measurement: at 5k images x ~400
                # preds/image the metrics phase runs 16.0 s sequential
                # vs 12.5 s parallel on a 1-core host (the native
                # matcher releases the GIL) — tools/bench_eval_e2e.py
                use_parallel=bool(self.eval_cfg.get('use_parallel', True)))
        self.timing['metrics_s'] = time.time() - t0
        self.timing['total_s'] = time.time() - t0_all
        results['timing'] = dict(self.timing)
        results['num_images'] = n
        self.results = results
        self.predictions = predictions
        self.ground_truths = ground_truths

        if self.save_results:
            self._save_results()
        return results

    def _save_annotated(self, raw, boxes, classes, scores, gt_boxes,
                        gt_classes, img_id, colors, cfg):
        out_dir = cfg.get('save_dir',
                          os.path.join(self.results_dir,
                                       'annotated_images'))
        os.makedirs(out_dir, exist_ok=True)
        img = raw
        if cfg.get('draw_predictions', True):
            img = draw_boxes(img, boxes, classes, scores, self.class_names,
                             colors)
        if cfg.get('draw_ground_truth', True) and len(gt_boxes):
            img = draw_boxes(img, gt_boxes, gt_classes,
                             np.ones(len(gt_boxes)), self.class_names,
                             [(255, 255, 255)] * len(self.class_names),
                             show_scores=False)
        ext = cfg.get('image_format', 'jpg')
        Image.fromarray(img).save(
            os.path.join(out_dir, f'eval_{img_id:06d}.{ext}'))

    def _save_results(self):
        os.makedirs(self.results_dir, exist_ok=True)
        out = {k: v for k, v in self.results.items()
               if k not in ('pr_curves', 'gt_counts')}
        out['gt_counts'] = self.results['gt_counts'].tolist()
        path = os.path.join(self.results_dir, 'evaluation_results.json')
        with open(path, 'w') as f:
            json.dump(out, f, indent=2)
        print(f'Saved results to {path}')
        if self.eval_cfg.get('save_detections'):
            # COCO results format ([{image_id, category_id, bbox, score}])
            # for cross-checking with pycocotools-style tooling
            dets = []
            for img_id, p in self.predictions.items():
                for box, cls, score in zip(p['boxes'], p['classes'],
                                           p['scores']):
                    dets.append({
                        'image_id': int(img_id),
                        'category_id': int(cls),
                        'bbox': [round(float(v), 2) for v in box],
                        'score': round(float(score), 5)})
            dpath = os.path.join(self.results_dir, 'detections.json')
            with open(dpath, 'w') as f:
                json.dump(dets, f)
            print(f'Saved {len(dets)} detections to {dpath}')

    def print_results(self):
        if self.results is None:
            print('No results yet — call evaluate() first.')
            return
        print(format_results(self.results))
        t = self.timing
        print(f"inference: {t.get('inference_s', 0):.1f}s "
              f"({t.get('images_per_sec', 0):.1f} img/s)  "
              f"metrics: {t.get('metrics_s', 0):.1f}s  "
              f"total: {t.get('total_s', 0):.1f}s")
