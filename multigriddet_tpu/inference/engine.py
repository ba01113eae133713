"""MultiGridInference: image / video / camera / directory inference.

TPU-native counterpart of the reference inference engine
(/root/reference/multigriddet/inference/inference_engine.py:24-441): the
model forward, decode, and NMS run as ONE jitted program on device
(make_infer_step); only JPEG decode, letterboxing and drawing stay on host.
The letterbox inverse runs on the tiny NMS output (<=max_boxes boxes).
"""

from __future__ import annotations

import glob
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..config import build_model_from_config, resolve_compute_dtype
from ..data.annotations import letterbox_image
from ..ops.geometry import canvas_boxes_to_image
from ..training.checkpoint import load_weights_flexible
from ..training.steps import fetch_detections, make_infer_step
from ..utils.visualization import draw_boxes, get_colors

_IMG_EXTS = ('.jpg', '.jpeg', '.png', '.bmp', '.webp')


class MultiGridInference:

    def __init__(self, config: Dict[str, Any]):
        self.config = config
        det = config.get('detection', {}) or {}
        self.confidence = float(det.get('confidence_threshold', 0.5))
        self.nms_threshold = float(det.get('nms_threshold', 0.45))
        self.nms_method = det.get('nms_method', 'diou')
        self.use_iol = bool(det.get('use_iol', True))
        self.max_boxes = int(det.get('max_boxes', 100))
        self.class_aware = bool(det.get('class_aware_nms', False))
        self.nms_backend = det.get('nms_backend', 'xla')  # xla | pallas | pallas_fused
        # NMS candidate pool after the confidence filter; the reference
        # considers every above-confidence box (multigrid_decode.py:262-302)
        # — raise this toward the total prediction count for exact-tail
        # parity at low confidence thresholds.
        self.pre_nms_top_k = int(det.get('pre_nms_top_k', 1024))
        # WBF replaces NMS when enabled, as in the reference
        # (inference_engine.py:126-135): device confidence filter + top-k,
        # then host-side weighted fusion of the candidate pool.
        self.use_wbf = bool(det.get('use_wbf', False))
        # 'paper' (arXiv:1910.13302 running-average clustering) or
        # 'reference' (exact twin of the reference's seed-box clustering,
        # pinned to fixtures — see postprocess/wbf.py)
        self.wbf_mode = str(det.get('wbf_mode', 'paper'))
        # detection.link_format: 'yuv420' ships planar YCbCr 4:2:0 over
        # the host->device link on the file-serving path (half the bytes
        # of RGB; the native JPEG loader emits the planes for free) —
        # ~2x directory/eval-style serving on a transfer-bound link.
        # Default 'rgb' keeps serving byte-exact (the evaluator, a
        # measurement path, defaults to yuv420 instead — evaluator.py).
        self.link_format = str(det.get('link_format', 'rgb'))
        self._load_model()

    def _load_model(self):
        # serving defaults to bfloat16 compute (environment.mixed_precision;
        # the reference's evaluator honors the same knob, ref
        # evaluator.py:50-54) — detections stay float32-parity because the
        # predict convs emit f32 and decode/NMS run in f32
        self.compute_dtype = resolve_compute_dtype(self.config,
                                                   default_mixed=True)
        self.model, self.spec = build_model_from_config(
            self.config, dtype=self.compute_dtype)
        input_cfg = self.config.get('input', {}) or {}
        shape = input_cfg.get('input_shape') or self.spec['input_shape']
        self.input_hw: Tuple[int, int] = tuple(shape[:2])
        self.class_names = self.spec.get('class_names') or [
            str(i) for i in range(self.spec['num_classes'])]
        self.colors = get_colors(len(self.class_names))

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
            print('WARNING: no weights loaded (random init)')
        self.variables = variables
        self._infer = make_infer_step(
            self.model, self.spec['anchors'], self.input_hw,
            confidence=self.confidence, nms_threshold=self.nms_threshold,
            nms_method=self.nms_method, use_iol=self.use_iol,
            max_boxes=self.max_boxes, class_aware=self.class_aware,
            nms_backend=self.nms_backend, pre_nms_top_k=self.pre_nms_top_k,
            use_wbf=self.use_wbf)
        self._infer_yuv = None
        if self.link_format == 'yuv420':
            self._infer_yuv = make_infer_step(
                self.model, self.spec['anchors'], self.input_hw,
                confidence=self.confidence,
                nms_threshold=self.nms_threshold,
                nms_method=self.nms_method, use_iol=self.use_iol,
                max_boxes=self.max_boxes, class_aware=self.class_aware,
                nms_backend=self.nms_backend,
                pre_nms_top_k=self.pre_nms_top_k,
                use_wbf=self.use_wbf, link_format='yuv420')
        # tuple outputs, fetched with ONE batched device_get: cheaper
        # than the packed-concat single-fetch design (the concat costs
        # ~6% of the fused program at b128; four batched transfers
        # measure FASTER than one packed fetch —
        # tools/profile_engine_gap.py, docs/STATUS.md round 5)

    def _host_fuse(self, boxes, classes, scores):
        """Apply WBF to one image's candidate pool (canvas pixels)."""
        if self.use_wbf:
            from ..postprocess.wbf import fuse_and_cap
            boxes, classes, scores = fuse_and_cap(
                boxes, classes, scores, iou_thr=self.nms_threshold,
                mode=self.wbf_mode, max_out=self.max_boxes)
        return boxes, classes, scores

    # ------------------------------------------------------------------

    def detect(self, image: Image.Image):
        """Detect on one PIL image.

        Returns (boxes [N,4] top-left xywh in original pixels,
        classes [N], scores [N]).
        """
        arr, _, _, _ = letterbox_image(image.convert('RGB'), self.input_hw)
        batch = jnp.asarray(arr)[None]  # uint8; normalized on device
        outs = self._infer(self.variables, batch)
        bxs, cls, scs, valid = (a[0] for a in fetch_detections(outs))
        keep = valid
        bxs, cls, scs = bxs[keep], cls[keep], scs[keep]
        bxs, cls, scs = self._host_fuse(bxs, cls, scs)
        if len(bxs):
            # canvas-pixels -> original image pixels, clipped to bounds
            ih, iw = image.size[1], image.size[0]
            bxs = np.asarray(canvas_boxes_to_image(
                bxs, (ih, iw), self.input_hw))
        return bxs, cls, scs

    def detect_batch(self, images: List[Image.Image], batch_size: int = 16,
                     pipeline_depth: int = 4):
        """Batched detection for serving throughput.

        Pads to ``batch_size`` and runs the fused infer step per chunk
        (uint8 transfer).  Software-pipelined: jax dispatch is async, and
        a chunk's results are not forced until ``pipeline_depth`` further
        chunks are in flight — host preprocessing overlaps device
        compute/transfers and the dispatch RTT of a tunneled device is
        hidden (measured: depth 4 is ~1.3x depth 1 on the file path).
        Returns a list of (boxes, classes, scores) in each image's
        original pixel space.
        """
        def preprocess(chunk):
            batch = np.zeros((batch_size, *self.input_hw, 3), np.uint8)
            sizes = []
            for i, img in enumerate(chunk):
                arr, _, _, _ = letterbox_image(img.convert('RGB'),
                                               self.input_hw)
                batch[i] = arr
                sizes.append((img.size[1], img.size[0]))
            return batch, sizes

        from collections import deque
        results = []
        pending = deque()
        for start in range(0, len(images), batch_size):
            batch, sizes = preprocess(images[start:start + batch_size])
            outs = self._infer(self.variables, jnp.asarray(batch))
            pending.append((outs, sizes))
            if len(pending) > max(pipeline_depth, 0):
                self._postprocess_batch(*pending.popleft(), results)
        while pending:
            self._postprocess_batch(*pending.popleft(), results)
        return results

    def _postprocess_batch(self, outs, sizes, results):
        """Force one dispatched chunk and map to original pixels.

        ``sizes`` rows are (orig_h, orig_w), or None for a slot whose
        input failed to load (appends an empty result)."""
        bxs, cls, scs, valid = fetch_detections(outs)  # forces the chunk
        empty = (np.zeros((0, 4), np.float32), np.zeros((0,), np.int32),
                 np.zeros((0,), np.float32))
        for i, size in enumerate(sizes):
            if size is None:
                results.append(empty)
                continue
            keep = valid[i]
            b, c, s = bxs[i][keep], cls[i][keep], scs[i][keep]
            b, c, s = self._host_fuse(b, c, s)
            if len(b):
                b = np.asarray(canvas_boxes_to_image(
                    b, size, self.input_hw))
            results.append((b, c, s))

    def detect_files(self, paths: List[str], batch_size: int = 16,
                     num_workers: int = 8, pipeline_depth: int = 4):
        """File-based batched detection on the native fast path.

        The C++ loader decodes JPEGs with DCT-domain downscaling and
        letterboxes on true OS threads (native/fastloader.cpp) straight
        into the fused device program — no PIL in the loop.  Pipelined
        like :meth:`detect_batch`; falls back to it when the native
        library is unavailable.  Returns a list of (boxes, classes,
        scores) per path in original pixels; files that fail to decode
        yield empty results.
        """
        from collections import deque

        from ..data.native import load_letterbox_batch, native_available
        # the native loader decodes JPEG only: a mixed/non-JPEG file list
        # would fail every native pass and serialize on per-slot PIL
        # retries, so gate it like HostImageLoader does
        all_jpeg = all(p.lower().endswith(('.jpg', '.jpeg'))
                       for p in paths)
        if not native_available() or not all_jpeg:
            empty = (np.zeros((0, 4), np.float32),
                     np.zeros((0,), np.int32), np.zeros((0,), np.float32))
            imgs, good_idx = [], []
            for i, p in enumerate(paths):
                try:
                    with Image.open(p) as im:
                        imgs.append(im.convert('RGB'))
                    good_idx.append(i)
                except Exception:
                    pass  # unreadable/corrupt file -> empty result slot
            good = self.detect_batch(imgs, batch_size, pipeline_depth)
            fallback_results = [empty] * len(paths)
            for i, r in zip(good_idx, good):
                fallback_results[i] = r
            return fallback_results
        use_yuv = self._infer_yuv is not None
        if use_yuv:
            from ..data.native import yuv_available
            from ..ops.yuv import rgb_to_yuv420_np
            use_yuv = (yuv_available() and self.input_hw[0] % 2 == 0
                       and self.input_hw[1] % 2 == 0)
        if use_yuv:
            from ..data.native import load_letterbox_yuv_batch
        results = []
        pending = deque()
        for start in range(0, len(paths), batch_size):
            chunk = paths[start:start + batch_size]
            if use_yuv:
                ys, cbs, crs, metas, ok = load_letterbox_yuv_batch(
                    chunk, self.input_hw, num_workers)
                parts = [ys, cbs, crs]
            else:
                imgs, metas, ok = load_letterbox_batch(
                    chunk, self.input_hw, num_workers)
                parts = [imgs]
            if len(chunk) < batch_size:  # fixed shape for the jit cache
                parts = [np.concatenate(
                    [p, np.zeros((batch_size - len(chunk), *p.shape[1:]),
                                 np.uint8)], axis=0) for p in parts]
            sizes = [(int(m[4]), int(m[3])) if good else None
                     for m, good in zip(metas, ok)]
            # the native loader decodes JPEG only: retry failed slots with
            # PIL so valid PNG/BMP/WebP inputs still produce detections
            # (only truly unreadable files stay empty)
            for i, good in enumerate(ok):
                if good:
                    continue
                try:
                    with Image.open(chunk[i]) as im:
                        rgb = im.convert('RGB')
                        iw, ih = rgb.size
                        arr, _, _, _ = letterbox_image(rgb, self.input_hw)
                    if use_yuv:
                        for p, plane in zip(parts, rgb_to_yuv420_np(arr)):
                            p[i] = plane
                    else:
                        parts[0][i] = arr
                    sizes[i] = (ih, iw)
                except Exception:
                    pass  # unreadable/corrupt file -> empty result slot
            if use_yuv:
                outs = self._infer_yuv(self.variables,
                                       *(jnp.asarray(p) for p in parts))
            else:
                outs = self._infer(self.variables, jnp.asarray(parts[0]))
            pending.append((outs, sizes))
            if len(pending) > max(pipeline_depth, 0):
                self._postprocess_batch(*pending.popleft(), results)
        while pending:
            self._postprocess_batch(*pending.popleft(), results)
        return results

    def predict_image(self, path: str, output_dir: Optional[str] = None,
                      show: bool = False):
        image = Image.open(path)
        t0 = time.time()
        boxes, classes, scores = self.detect(image)
        dt = time.time() - t0
        print(f'{os.path.basename(path)}: {len(boxes)} objects '
              f'in {dt*1000:.1f} ms')
        annotated = draw_boxes(np.asarray(image.convert('RGB')), boxes,
                               classes, scores, self.class_names,
                               self.colors)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            out_path = os.path.join(output_dir, os.path.basename(path))
            Image.fromarray(annotated).save(out_path)
            print(f'Saved to {out_path}')
        if show:  # output.show_result (reference inference_engine.py:382)
            try:
                Image.fromarray(annotated).show()
            except Exception as exc:  # headless host: warn, don't fail
                print(f'WARNING: could not display image: {exc}')
        return annotated, (boxes, classes, scores)

    def predict_directory(self, directory: str,
                          output_dir: Optional[str] = None,
                          batch_size: int = 16):
        """Annotate every image in a directory.

        Detection runs through the pipelined :meth:`detect_files` batch
        path (the reference loops predict-image per file,
        inference_engine.py:408-441 — one device round-trip each; on a
        tunneled device that RTT dominates, so batching is ~batch_size x
        faster).  Per-image console lines and annotated outputs keep the
        reference's contract; unreadable files yield empty detections
        with a warning.
        """
        paths = sorted(
            p for p in glob.glob(os.path.join(directory, '*'))
            if p.lower().endswith(_IMG_EXTS))
        t0 = time.time()
        detections = self.detect_files(paths, batch_size=batch_size)
        dt = time.time() - t0
        results = []
        for p, (boxes, classes, scores) in zip(paths, detections):
            print(f'{os.path.basename(p)}: {len(boxes)} objects')
            try:
                with Image.open(p) as im:
                    rgb = np.asarray(im.convert('RGB'))
            except Exception as exc:
                print(f'WARNING: could not read {p} for annotation: {exc}')
                results.append((None, (boxes, classes, scores)))
                continue
            annotated = draw_boxes(rgb, boxes, classes, scores,
                                   self.class_names, self.colors)
            if output_dir:
                os.makedirs(output_dir, exist_ok=True)
                Image.fromarray(annotated).save(
                    os.path.join(output_dir, os.path.basename(p)))
            results.append((annotated, (boxes, classes, scores)))
        if paths:
            print(f'{len(paths)} images in {dt:.2f}s '
                  f'({len(paths)/max(dt, 1e-9):.1f} img/s detection)')
        return results

    def predict_video(self, source, output_path: Optional[str] = None,
                      show: bool = False, max_frames: Optional[int] = None,
                      pipeline_depth: int = 2, batch_size: int = 8,
                      resolution: Optional[Tuple[int, int]] = None):
        """Video (or camera index) loop via cv2
        (reference inference_engine.py:153-347).

        Frames are processed ``batch_size`` at a time through ONE fused
        device call (per-call dispatch overhead is fixed — on a tunneled
        device every call pays a full RTT, so frame-at-a-time tops out
        near 1/RTT FPS regardless of model speed), and a chunk's results
        are forced only after ``pipeline_depth`` further chunks are in
        flight so host decode/letterbox overlaps device work.  Output
        latency grows by up to ``(pipeline_depth + 1) * batch_size``
        frames; pass ``batch_size=1, pipeline_depth=0`` for a live
        control loop (that is :meth:`predict_camera`'s default).
        """
        from collections import deque

        import cv2
        cap = cv2.VideoCapture(source)
        if not cap.isOpened():
            raise IOError(f'cannot open video source {source!r}')
        if resolution:  # camera capture size (w, h) — reference
            # inference_engine.py:264-266; a fixed video file ignores it
            cap.set(cv2.CAP_PROP_FRAME_WIDTH, int(resolution[0]))
            cap.set(cv2.CAP_PROP_FRAME_HEIGHT, int(resolution[1]))
        writer = None
        if output_path:
            video_cfg = self.config.get('video', {}) or {}
            fps = video_cfg.get('fps') or cap.get(cv2.CAP_PROP_FPS) or 25
            fourcc = cv2.VideoWriter_fourcc(
                *video_cfg.get('fourcc', 'mp4v'))
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            writer = cv2.VideoWriter(output_path, fourcc, fps, (w, h))
        frames = 0
        stop = False
        batch_size = max(batch_size, 1)
        pending = deque()
        batch = np.zeros((batch_size, *self.input_hw, 3), np.uint8)
        rgbs: list = []

        def dispatch():
            nonlocal batch
            pending.append((self._infer(self.variables, jnp.asarray(batch)),
                            list(rgbs)))
            rgbs.clear()
            # jnp.asarray's host->device copy is async (and may alias the
            # numpy memory on CPU backends): the dispatched chunk must keep
            # its own buffer — writing the next chunk into it would race
            # the in-flight transfer.
            batch = np.zeros((batch_size, *self.input_hw, 3), np.uint8)

        def flush_one():
            nonlocal stop
            outs, chunk_rgbs = pending.popleft()
            bxs, cls, scs, valid = fetch_detections(outs)
            for i, rgb in enumerate(chunk_rgbs):
                b = bxs[i][valid[i]]
                c, s = cls[i][valid[i]], scs[i][valid[i]]
                b, c, s = self._host_fuse(b, c, s)
                if len(b):
                    b = np.asarray(canvas_boxes_to_image(
                        b, rgb.shape[:2], self.input_hw))
                annotated = draw_boxes(rgb, b, c, s, self.class_names,
                                       self.colors)
                bgr = cv2.cvtColor(annotated, cv2.COLOR_RGB2BGR)
                if writer is not None:
                    writer.write(bgr)
                if show:  # pragma: no cover
                    cv2.imshow('MultiGridDet', bgr)
                    if cv2.waitKey(1) & 0xFF == ord('q'):
                        stop = True
                        return

        t0 = time.time()
        try:
            while not stop:
                ok, frame = cap.read()
                if not ok or (max_frames and frames >= max_frames):
                    break
                rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                # cv2 letterbox (~3x cheaper than PIL per frame); same
                # geometry as data.annotations.letterbox_image
                th, tw = self.input_hw
                ih, iw = rgb.shape[:2]
                s = min(tw / iw, th / ih)
                nw, nh = int(round(iw * s)), int(round(ih * s))
                px, py = (tw - nw) // 2, (th - nh) // 2
                slot = batch[len(rgbs)]
                slot[:] = 128
                slot[py:py + nh, px:px + nw] = cv2.resize(
                    rgb, (nw, nh), interpolation=cv2.INTER_CUBIC)
                rgbs.append(rgb)
                frames += 1
                if len(rgbs) == batch_size:
                    dispatch()
                    if len(pending) > max(pipeline_depth, 0):
                        flush_one()
            if rgbs and not stop:  # final partial chunk (padded slots
                dispatch()         # are decoded but never emitted)
            while pending and not stop:
                flush_one()
        finally:
            cap.release()
            if writer is not None:
                writer.release()
        dt = time.time() - t0
        if frames:
            print(f'{frames} frames in {dt:.1f}s ({frames/dt:.1f} FPS)')
        return frames

    def predict_camera(self, device_id: int = 0, show: bool = True,
                       max_frames: Optional[int] = None):
        # live loop: no batching/pipelining — minimum display latency.
        # camera.resolution sets the capture size (reference
        # inference_engine.py:264-266)
        cam = self.config.get('camera', {}) or {}
        resolution = cam.get('resolution')
        return self.predict_video(device_id, None, show, max_frames,
                                  pipeline_depth=0, batch_size=1,
                                  resolution=resolution)

    def run(self):
        """Dispatch on input.type (reference inference_engine.py:349-441)."""
        input_cfg = self.config.get('input', {}) or {}
        output_cfg = self.config.get('output', {}) or {}
        out_dir = (output_cfg.get('output_dir', 'output')
                   if output_cfg.get('save_result', True) else None)
        kind = input_cfg.get('type', 'image')
        source = input_cfg.get('source')
        if kind == 'image':
            return self.predict_image(source, out_dir,
                                      show=output_cfg.get('show_result',
                                                          False))
        if kind == 'directory':
            return self.predict_directory(source, out_dir)
        if kind == 'video':
            out_path = None
            if out_dir:
                os.makedirs(out_dir, exist_ok=True)
                out_path = os.path.join(
                    out_dir, 'annotated_' + os.path.basename(str(source)))
            video_cfg = self.config.get('video', {}) or {}
            return self.predict_video(
                source, out_path,
                show=bool(output_cfg.get('show_result', False)),
                pipeline_depth=int(video_cfg.get('pipeline_depth', 2)),
                batch_size=int(video_cfg.get('batch_size', 8)))
        if kind == 'camera':
            # input.source carries the device id when given ("--input 1",
            # reference inference_engine.py:349-441); camera.device_id is
            # the config-file spelling
            cam = self.config.get('camera', {}) or {}
            device = (int(source) if source is not None
                      and str(source).isdigit()
                      else int(cam.get('device_id', 0)))
            return self.predict_camera(
                device, show=bool(output_cfg.get('show_result', True)))
        raise ValueError(f'unknown input type {kind!r}')
