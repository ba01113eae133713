"""The MultiGridDet-TPU input pipeline: host decode -> device everything.

Replaces the reference's 3.4k-LoC dual tf.data/Sequence generator
(/root/reference/multigriddet/data/generators.py:1369-2406) with one design:

  host threads:  read file -> JPEG decode -> letterbox -> u8 batch
  device (jit):  cast -> photometric augs -> crop/pad zoom -> flips ->
                 rotate90 -> gridmask -> capacity expand -> mosaic ->
                 mixup -> normalize -> 9-cell target encode

The whole device stage is ONE compiled XLA program per input bucket, so
augmentation + encoding ride the accelerator instead of host CPUs.

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


@functools.partial(
    jax.jit,
    static_argnames=('aug_cfg', 'anchors_tuple', 'num_classes', 'input_hw',
                     'train', 'multi_anchor_assign'))
def _device_stage(images_u8, boxes, key, aug_cfg, anchors_tuple, num_classes,
                  input_hw, train, multi_anchor_assign=False):
    """images u8 [B,H,W,3] + boxes [B,N,5] -> (images f32 [0,1], y_true)."""
    images = images_u8.astype(jnp.float32)
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
                 disk_cache_dir: Optional[str] = None):
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
        self.loader = HostImageLoader(
            self.lines, self.input_shape, max_boxes, num_workers,
            cache_images=cache_images, disk_cache_dir=disk_cache_dir)
        self.drop_remainder = drop_remainder
        self.multi_anchor_assign = multi_anchor_assign
        self._anchors_tuple = tuple(
            tuple(map(tuple, a.tolist())) for a in self.anchors)

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

    def process_batch(self, images_u8: np.ndarray, boxes: np.ndarray,
                      input_hw: Optional[Tuple[int, int]] = None):
        """Run the jitted device stage on one host batch."""
        hw = tuple(input_hw or self.input_shape)
        self.key, sub = jax.random.split(self.key)
        images, y_true, aug_boxes = _device_stage(
            jnp.asarray(images_u8), jnp.asarray(boxes), sub,
            _freeze(self.augment_cfg), self._anchors_tuple,
            self.num_classes, hw, self.train, self.multi_anchor_assign)
        return images, y_true, aug_boxes

    def __iter__(self):
        """Iterate batches with host-side prefetch.

        A producer thread runs decode + letterbox for the next batches
        while the device executes the current one (replaces the
        reference's tf.data prefetch, generators.py:2131).
        """
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
                    q.put((self.loader.load_batch(batch_lines, hw), hw))
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
            (images_u8, boxes), hw = item
            yield self.process_batch(images_u8, boxes, hw)
        thread.join()

    def close(self):
        self.loader.close()
