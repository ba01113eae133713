"""The MultiGridDet-TPU input pipeline: host decode -> device everything.

Replaces the reference's 3.4k-LoC dual tf.data/Sequence generator
(/root/reference/multigriddet/data/generators.py:1369-2406) with one design:

  host threads:  read file -> JPEG decode -> letterbox -> u8 batch
  device (jit):  cast -> photometric augs -> crop/pad zoom -> flips ->
                 rotate90 -> gridmask -> capacity expand -> mosaic ->
                 mixup -> normalize -> 9-cell target encode

The whole device stage is ONE compiled XLA program per input bucket, so
augmentation + encoding ride the accelerator instead of host CPUs.

With ``cache_images_device`` the decoded u8 images additionally live in
an HBM bank (:class:`_DeviceImageCache`): from epoch 2 on, batches are
gathered on device and the host link carries only box rows + indices.

Capacity discipline matches the reference (generators.py:1492-1556): the
fixed ``max_boxes`` capacity is expanded x8/x4/x2/x1 depending on which of
mosaic (x4) and mixup (x2) are enabled, and never silently truncated
afterwards.

Multi-scale training uses a bucketed shape list (reference
data/utils.py:15-29: 320..672 step 32); each bucket compiles once and is
then re-sampled every ``rescale_interval`` batches.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.encoding import encode_targets
from . import augment as A
from .annotations import HostImageLoader

MULTISCALE_SHAPES = tuple((s, s) for s in range(320, 673, 32))


def calculate_expansion_factor(mosaic_prob: float, mixup_prob: float) -> int:
    """x8 mosaic+mixup, x4 mosaic, x2 mixup, x1 none
    (reference generators.py:1492-1517)."""
    factor = 1
    if mosaic_prob > 0:
        factor *= 4
    if mixup_prob > 0:
        factor *= 2
    return factor


def _pixels_to_f32(pixels):
    """Link-transport pixels -> f32 RGB [0,255] images.

    ``pixels`` is either a bare u8 RGB batch [B,H,W,3], a 1-tuple of
    one, or a 3-tuple of planar YCbCr 4:2:0 (y [B,H,W], cb/cr
    [B,H/2,W/2]) — the half-bandwidth link format (ops/yuv.py); the
    inverse conversion fuses into this program.
    """
    if isinstance(pixels, (tuple, list)):
        if len(pixels) == 3:
            from ..ops.yuv import yuv420_to_rgb
            return yuv420_to_rgb(*pixels)
        pixels = pixels[0]
    return pixels.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=('aug_cfg', 'anchors_tuple', 'num_classes', 'input_hw',
                     'train', 'multi_anchor_assign'))
def _device_stage(images_u8, boxes, key, aug_cfg, anchors_tuple, num_classes,
                  input_hw, train, multi_anchor_assign=False):
    """pixels (see _pixels_to_f32) + boxes [B,N,5] -> (images f32 [0,1],
    y_true)."""
    images = _pixels_to_f32(images_u8)
    cfg = dict(aug_cfg)
    if train and cfg.get('enabled', True):
        keys = jax.random.split(key, 12)
        images, boxes = A.random_resize_crop_pad(
            keys[0], images, boxes,
            scale_range=cfg.get('scale_range', (0.7, 1.3)))
        images, boxes = A.random_hflip(keys[1], images, boxes,
                                       prob=cfg.get('hflip_prob', 0.5))
        images, boxes = A.random_brightness(keys[2], images, boxes)
        images, boxes = A.random_contrast(keys[3], images, boxes)
        images, boxes = A.random_saturation(keys[4], images, boxes)
        images, boxes = A.random_hue(keys[5], images, boxes)
        images, boxes = A.random_grayscale(
            keys[6], images, boxes, prob=cfg.get('grayscale_prob', 0.1))
        if cfg.get('blur_prob', 0.0) > 0:
            images, boxes = A.random_blur(keys[11], images, boxes,
                                          prob=cfg['blur_prob'])
        if cfg.get('sharpness_prob', 0.0) > 0:
            images, boxes = A.random_sharpness(
                jax.random.fold_in(key, 101), images, boxes,
                prob=cfg['sharpness_prob'])
        if cfg.get('motion_blur_prob', 0.0) > 0:
            images, boxes = A.random_motion_blur(
                jax.random.fold_in(key, 102), images, boxes,
                prob=cfg['motion_blur_prob'])
        if cfg.get('rotate_any_prob', 0.0) > 0:
            images, boxes = A.random_rotate_any(
                jax.random.fold_in(key, 103), images, boxes,
                prob=cfg['rotate_any_prob'],
                max_deg=cfg.get('rotate_max_deg', 15.0))
        images, boxes = A.random_rotate90(
            keys[7], images, boxes, prob=cfg.get('rotate_prob', 0.05))
        if cfg.get('enhance_type') == 'gridmask':
            images, boxes = A.random_gridmask(
                keys[8], images, boxes, prob=cfg.get('gridmask_prob', 0.1))
        mosaic_prob = cfg.get('mosaic_prob', 0.0)
        mixup_prob = cfg.get('mixup_prob', 0.0)
        factor = calculate_expansion_factor(mosaic_prob, mixup_prob)
        boxes = A.expand_box_capacity(boxes, factor)
        if mosaic_prob > 0:
            images, boxes = A.random_mosaic(keys[9], images, boxes,
                                            prob=mosaic_prob)
        if mixup_prob > 0:
            images, boxes = A.random_mixup(keys[10], images, boxes,
                                           prob=mixup_prob)
        cp_prob = cfg.get('copypaste_prob', 0.0)
        if cp_prob > 0:
            # capacity grows by +copypaste_max slots (additive, unlike the
            # x4/x2 mosaic/mixup expansion) to hold the pasted boxes
            cp_max = int(cfg.get('copypaste_max', 4))
            boxes = jnp.pad(boxes, ((0, 0), (0, cp_max), (0, 0)))
            images, boxes = A.random_copypaste(
                jax.random.fold_in(key, 104), images, boxes, prob=cp_prob,
                max_paste=cp_max)
    images = A.normalize_images(images)
    y_true = encode_targets(boxes, [np.asarray(a, np.float32)
                                    for a in anchors_tuple],
                            num_classes, input_hw,
                            multi_anchor_assign=multi_anchor_assign)
    return images, y_true, boxes


@functools.partial(
    jax.jit,
    static_argnames=('aug_cfg', 'anchors_tuple', 'num_classes', 'input_hw',
                     'train', 'multi_anchor_assign'))
def _device_stage_bank(banks, idx, boxes, key, aug_cfg, anchors_tuple,
                       num_classes, input_hw, train,
                       multi_anchor_assign=False):
    """Device-cache variant of :func:`_device_stage`: the batch's pixels
    are GATHERED from the HBM-resident image bank (one fused program —
    the gathered u8 rows never round-trip to host), so a steady-state
    epoch moves only the tiny per-batch boxes/indices over the host
    link.  ``banks`` is a tuple of per-part banks (1 for rgb, 3 for the
    yuv420 link format)."""
    if not isinstance(banks, (tuple, list)):
        banks = (banks,)
    parts = tuple(b[idx] for b in banks)
    return _device_stage(parts, boxes, key, aug_cfg, anchors_tuple,
                         num_classes, input_hw, train, multi_anchor_assign)


@functools.partial(jax.jit, donate_argnums=(0,))
def _bank_scatter(bank, rows, images_u8):
    """Write a decoded batch into its bank rows in place (donated)."""
    return bank.at[rows].set(images_u8)


class _DeviceImageCache:
    """Decoded-image cache in device HBM (beyond-reference, TPU-native).

    The reference caches decoded pixels in host RAM at best
    (generators.py `cache_images`); every epoch still pushes the full
    raw-pixel stream over the host->device link.  On TPU that link is
    the input pipeline's last bottleneck once decode is cached — and on
    shared/tunneled interconnects its bandwidth can fluctuate by more
    than an order of magnitude (docs/STATUS.md round-4).  For
    fine-tune-scale datasets the decoded u8 images simply FIT in HBM
    (~30k images at 416x416 per 15 GB), so epoch >= 2 batches are
    assembled ON DEVICE by gathering bank rows; the only per-batch
    host->device traffic is the [B, max_boxes, 5] float32 ground-truth
    rows and a [B] int32 row index (~65 KB at b32).

    One bank per canvas hw (multi-scale buckets cache independently).
    Banks are pre-sized to the dataset's row count so every scatter /
    gather program compiles exactly once per bucket.  A byte budget
    (shared across buckets) bounds HBM use: a bucket whose bank does
    not fit is simply never cached (those batches keep the host path).
    """

    def __init__(self, n_rows: int, budget_bytes: int,
                 ledger: Optional[Dict[str, int]] = None):
        self.n_rows = int(n_rows)
        self.budget = int(budget_bytes)
        # shared byte ledger: several caches (e.g. the trainer's train +
        # val generators) can draw from ONE budget so
        # `device_cache_budget_gb` bounds total HBM use, not per-cache
        self._ledger = ledger if ledger is not None else {'bytes': 0}
        self._row: Dict[Tuple[str, Tuple[int, int]], int] = {}
        self._next: Dict[Tuple[int, int], int] = {}
        # per canvas: a tuple of per-part banks — 1 part for rgb
        # ([R,H,W,3] u8), 3 for the yuv420 link format (y [R,H,W] +
        # cb/cr [R,H/2,W/2] u8, which also HALVES the HBM a bank costs)
        self._banks: Dict[Tuple[int, int], Tuple[jax.Array, ...]] = {}
        self._boxes: Dict[Tuple[str, Tuple[int, int]], np.ndarray] = {}
        self._uncacheable: set = set()

    @property
    def bytes(self) -> int:
        return self._ledger['bytes']

    def _ensure_bank(self, hw: Tuple[int, int], parts) -> bool:
        if hw in self._banks:
            return True
        if hw in self._uncacheable:
            return False
        shapes = [(self.n_rows, *p.shape[1:]) for p in parts]
        need = sum(int(np.prod(shp)) for shp in shapes)  # u8
        if self.bytes + need > self.budget:
            import warnings
            warnings.warn(
                f'device image cache: bank for canvas {hw} needs '
                f'{need / 1e9:.2f} GB but only '
                f'{(self.budget - self.bytes) / 1e9:.2f} GB of the '
                f'budget remains — this canvas streams from host instead')
            self._uncacheable.add(hw)
            return False
        self._banks[hw] = tuple(jnp.zeros(shp, jnp.uint8)
                                for shp in shapes)
        self._next[hw] = 0
        self._ledger['bytes'] += need
        return True

    def add_batch(self, hw: Tuple[int, int], lines: Sequence[str],
                  parts_dev, boxes_np: np.ndarray) -> None:
        """Write an already-transferred decoded batch into the bank.

        ``parts_dev`` is the tuple of on-device pixel parts (1 for rgb,
        3 for yuv420).  Called from the consumer right after the
        epoch-1 host path has the batch on device anyway, so caching
        costs no extra transfer.  Re-seen lines rewrite their existing
        row (same content)."""
        hw = tuple(hw)
        if not isinstance(parts_dev, (tuple, list)):
            parts_dev = (parts_dev,)
        if not self._ensure_bank(hw, parts_dev):
            return
        rows = np.empty(len(lines), np.int32)
        inserted = []
        for i, line in enumerate(lines):
            key = (line, hw)
            row = self._row.get(key)
            if row is None:
                row = self._next[hw]
                if row >= self.n_rows:  # defensive; pre-sized to fit
                    # roll back this call's inserts: a _row entry whose
                    # pixels were never scattered would make has() return
                    # True and later epochs gather all-zero images
                    for k in inserted:
                        del self._row[k]
                        del self._boxes[k]
                    self._uncacheable.add(hw)
                    return
                self._row[key] = row
                self._next[hw] = row + 1
                self._boxes[key] = np.array(boxes_np[i])
                inserted.append(key)
            rows[i] = row
        rows_dev = jnp.asarray(rows)
        self._banks[hw] = tuple(
            _bank_scatter(bank, rows_dev, part)
            for bank, part in zip(self._banks[hw], parts_dev))

    def has(self, hw: Tuple[int, int], lines: Sequence[str]) -> bool:
        hw = tuple(hw)
        if hw not in self._banks or hw in self._uncacheable:
            return False
        return all((line, hw) in self._row for line in lines)

    def gather_args(self, hw: Tuple[int, int], lines: Sequence[str],
                    max_boxes: int):
        """(banks tuple, row idx [B] i32, boxes [B, max_boxes, 5] f32)."""
        hw = tuple(hw)
        idx = np.asarray([self._row[(line, hw)] for line in lines],
                         np.int32)
        boxes = np.zeros((len(lines), max_boxes, 5), np.float32)
        for i, line in enumerate(lines):
            boxes[i] = self._boxes[(line, hw)]
        return self._banks[hw], idx, boxes


def _freeze(d: Dict) -> Tuple:
    """Dict -> hashable tuple (for jit static args)."""
    out = []
    for k in sorted(d):
        v = d[k]
        if isinstance(v, list):
            v = tuple(v)
        out.append((k, v))
    return tuple(out)


class MultiGridDataGenerator:
    """Batched, device-augmented data generator.

    API counterpart of the reference MultiGridDataGenerator
    (generators.py:1369-2406) re-imagined for TPU: iterate to get
    ``(images, y_true, boxes)`` with images in [0,1] and y_true the 9-cell
    target grids, all produced on-device.
    """

    def __init__(self,
                 annotation_lines: Sequence[str],
                 anchors: Sequence[np.ndarray],
                 num_classes: int,
                 input_shape: Tuple[int, int] = (608, 608),
                 batch_size: int = 8,
                 max_boxes: int = 100,
                 augment: Optional[Dict] = None,
                 train: bool = True,
                 rescale_interval: int = -1,
                 num_workers: int = 8,
                 seed: int = 0,
                 drop_remainder: bool = True,
                 multi_anchor_assign: bool = False,
                 cache_images: bool = False,
                 disk_cache_dir: Optional[str] = None,
                 cache_images_device: bool = False,
                 device_cache_budget: int = 4 << 30,
                 device_cache_ledger: Optional[Dict[str, int]] = None,
                 link_format: str = 'auto'):
        self.lines = list(annotation_lines)
        self.anchors = [np.asarray(a, np.float32) for a in anchors]
        self.num_classes = num_classes
        self.input_shape = tuple(input_shape[:2])
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.augment_cfg = dict(augment or {})
        self.train = train
        self.rescale_interval = rescale_interval
        self.rng = np.random.RandomState(seed)
        self.key = jax.random.PRNGKey(seed)
        # link transport: 'yuv420' ships planar YCbCr 4:2:0 over the
        # host->device link — HALF the bytes of 'rgb', inverted on
        # device as the first fusable op of the stage program
        # (ops/yuv.py; round trip errs less than one JPEG re-save).
        # 'auto' = yuv420 for training generators with an even canvas
        # (the streaming steady state is link-bound — docs/STATUS.md
        # round 5); eval/serving generators keep the exact rgb canvas.
        if link_format == 'auto':
            even = (self.input_shape[0] % 2 == 0
                    and self.input_shape[1] % 2 == 0)
            link_format = 'yuv420' if (train and even) else 'rgb'
        self.link_format = link_format
        self.loader = HostImageLoader(
            self.lines, self.input_shape, max_boxes, num_workers,
            cache_images=cache_images, disk_cache_dir=disk_cache_dir,
            link_format=link_format)
        self.drop_remainder = drop_remainder
        self.multi_anchor_assign = multi_anchor_assign
        self._anchors_tuple = tuple(
            tuple(map(tuple, a.tolist())) for a in self.anchors)
        # HBM-resident decoded-image bank: epoch >= 2 batches gather on
        # device instead of re-streaming raw pixels over the host link.
        # device_cache_ledger (optional) shares ONE byte budget between
        # several generators (the trainer passes one for train + val).
        self._dcache = (_DeviceImageCache(len(self.lines),
                                          device_cache_budget,
                                          ledger=device_cache_ledger)
                        if cache_images_device else None)

    def __len__(self):
        if self.drop_remainder:
            return len(self.lines) // self.batch_size
        return -(-len(self.lines) // self.batch_size)

    steps_per_epoch = property(__len__)

    def _pick_shape(self, step: int) -> Tuple[int, int]:
        if (not self.train or self.rescale_interval <= 0):
            return self.input_shape
        if step % self.rescale_interval == 0 or not hasattr(self, '_cur_hw'):
            # bucketed multi-scale (reference data/utils.py:15-29)
            max_side = max(self.input_shape)
            options = [s for s in MULTISCALE_SHAPES if s[0] <= max_side]
            if not options:
                # input smaller than every bucket: synthesize /32 buckets
                # below the nominal size
                sides = [s for s in range(max(32, max_side // 2 // 32 * 32),
                                          max_side + 1, 32)] or [max_side]
                options = [(s, s) for s in sides]
            self._cur_hw = options[self.rng.randint(len(options))]
        return self._cur_hw

    def process_batch(self, pixels, boxes: np.ndarray,
                      input_hw: Optional[Tuple[int, int]] = None):
        """Run the jitted device stage on one host batch.

        ``pixels``: a u8 RGB batch [B,H,W,3] or the loader's link-format
        parts tuple (1-tuple rgb / 3-tuple yuv420)."""
        hw = tuple(input_hw or self.input_shape)
        if not isinstance(pixels, tuple):
            pixels = (jnp.asarray(pixels),)
        else:
            pixels = tuple(jnp.asarray(p) for p in pixels)
        self.key, sub = jax.random.split(self.key)
        images, y_true, aug_boxes = _device_stage(
            pixels, jnp.asarray(boxes), sub,
            _freeze(self.augment_cfg), self._anchors_tuple,
            self.num_classes, hw, self.train, self.multi_anchor_assign)
        return images, y_true, aug_boxes

    def _prefetched(self):
        """Host-side prefetch: a producer thread runs decode + letterbox
        for the next batches while the device executes the current one
        (replaces the reference's tf.data prefetch, generators.py:2131).
        Yields ``(payload_or_None, batch_lines, hw)`` — payload is None
        when every pixel of the batch is resident in the HBM bank."""
        import queue
        import threading

        order = np.arange(len(self.lines))
        if self.train:
            self.rng.shuffle(order)
        steps = len(self)  # honors drop_remainder, so len() == yielded steps
        q: 'queue.Queue' = queue.Queue(maxsize=2)

        def producer():
            try:
                for step in range(steps):
                    start = step * self.batch_size
                    idx = order[start:start + self.batch_size]
                    if len(idx) < self.batch_size:
                        # pad the final partial batch by wrapping so the
                        # compiled device-stage shape is reused (no ragged
                        # shapes under jit).  NOTE: the wrapped samples are
                        # duplicates with no validity mask, so with
                        # drop_remainder=False aggregate metrics/losses over
                        # a full epoch double-count up to batch_size-1
                        # samples; both in-tree consumers (trainer, eval
                        # loader) use drop_remainder=True or track the true
                        # image count themselves.
                        idx = np.resize(idx, self.batch_size)
                    batch_lines = [self.lines[i] for i in idx]
                    hw = self._pick_shape(step)
                    if (self._dcache is not None
                            and self._dcache.has(hw, batch_lines)):
                        # every pixel is already in the HBM bank — skip
                        # the host load entirely; the consumer gathers
                        q.put((None, batch_lines, hw))
                    else:
                        pixels, boxes = self.loader.load_batch(
                            batch_lines, hw)
                        if not isinstance(pixels, tuple):
                            pixels = (pixels,)
                        # start the host->device copy HERE, in the
                        # producer thread: it overlaps the consumer's
                        # device dispatch instead of serializing with it
                        # (the tunneled link's per-batch copy is a large
                        # share of the streaming steady state)
                        parts = tuple(jax.device_put(p) for p in pixels)
                        q.put(((parts, boxes), batch_lines, hw))
                q.put(None)
            except BaseException as exc:  # propagate to the consumer —
                # a swallowed producer error would silently end the epoch
                # early and train on a prefix of the dataset
                q.put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        thread.join()

    def __iter__(self):
        """Iterate processed batches ``(images, y_true, boxes)``."""
        for payload, batch_lines, hw in self._prefetched():
            if payload is None:
                yield self._process_batch_from_bank(batch_lines, hw)
                continue
            parts, boxes = payload
            if self._dcache is not None:
                self._dcache.add_batch(hw, batch_lines, parts, boxes)
            yield self.process_batch(parts, boxes, hw)

    def iter_raw(self):
        """Iterate RAW batches for a fused train step (training/steps.py
        make_fused_train_step): the device stage is NOT run here — the
        consumer folds it into its own single XLA program.

        Yields ``('host', parts, boxes_np, hw, key)`` for streamed
        batches — ``parts`` is the on-device pixel tuple (1-tuple rgb /
        3-tuple yuv420, already transferred) — or
        ``('bank', banks, idx_np, boxes_np, hw, key)`` when every pixel
        of the batch is resident in the HBM image bank (``banks`` is
        the per-part bank tuple).  ``key`` is the per-batch PRNG key
        the fused stage should use.
        """
        for payload, batch_lines, hw in self._prefetched():
            self.key, sub = jax.random.split(self.key)
            if payload is None:
                banks, idx, boxes = self._dcache.gather_args(
                    hw, batch_lines, self.max_boxes)
                yield ('bank', banks, idx, boxes, hw, sub)
                continue
            parts, boxes = payload
            if self._dcache is not None:
                self._dcache.add_batch(hw, batch_lines, parts, boxes)
            yield ('host', parts, boxes, hw, sub)

    def _process_batch_from_bank(self, batch_lines: Sequence[str],
                                 input_hw: Tuple[int, int]):
        """Device-cached batch: gather bank rows + aug + encode, fused."""
        hw = tuple(input_hw)
        banks, idx, boxes = self._dcache.gather_args(hw, batch_lines,
                                                     self.max_boxes)
        self.key, sub = jax.random.split(self.key)
        return _device_stage_bank(
            banks, jnp.asarray(idx), jnp.asarray(boxes), sub,
            _freeze(self.augment_cfg), self._anchors_tuple,
            self.num_classes, hw, self.train, self.multi_anchor_assign)

    def close(self):
        self.loader.close()
