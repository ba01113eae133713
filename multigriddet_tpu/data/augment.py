"""On-device, batched image + box augmentation (pure JAX, fixed shapes).

TPU-native redesign of the reference's TF-graph augmentation stack
(/root/reference/multigriddet/data/generators.py:167-1282 and the PIL twin
in data/augmentation.py): every op is a pure function
``(key, images, boxes) -> (images, boxes)`` over a whole batch with static
shapes, so the entire augmentation chain + target encoding jits into ONE
XLA program that runs on the accelerator — this is where the >=5x
samples/sec target over the reference's host pipeline comes from
(SURVEY.md §6).

Conventions:
* images: ``[B, H, W, 3]`` float32 in [0, 255].
* boxes: ``[B, N, 5]`` ``(x1, y1, x2, y2, class)`` absolute pixels; zero
  rows are padding.  Capacity N is fixed; ops never drop capacity, they
  zero-out boxes that die (clip/min-size), exactly like the reference's
  fixed-capacity discipline (generators.py:1492-1556).
* randomness: explicit ``jax.random`` keys, split per-image inside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GRAY_FILL = 128.0
MIN_BOX_PX = 3.0


def _valid(boxes: jnp.ndarray) -> jnp.ndarray:
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > 0) & (h > 0)


def _zero_dead(boxes: jnp.ndarray, alive: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(alive[..., None], boxes, 0.0)


def _clip_filter(boxes: jnp.ndarray, w: float, h: float,
                 min_px: float = MIN_BOX_PX) -> jnp.ndarray:
    """Clip boxes to the canvas and kill those below the min pixel size."""
    was_valid = _valid(boxes)
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    out = jnp.stack([x1, y1, x2, y2, boxes[..., 4]], axis=-1)
    alive = was_valid & ((x2 - x1) >= min_px) & ((y2 - y1) >= min_px)
    return _zero_dead(out, alive)


# ---------------------------------------------------------------------------
# Photometric ops (match the reference's [0,255]-domain TF ops,
# generators.py:260-344).  The deterministic adjust_* cores replicate
# tf.image.adjust_* exactly (pinned by tests/test_reference_parity.py
# against recorded reference fixtures); the random_* wrappers add the
# per-sample probability gates and parameter draws.  Everything is
# elementwise (VPU-friendly) and fuses under jit.
# ---------------------------------------------------------------------------

def _rgb_to_hsv(rgb: jnp.ndarray):
    """RGB [..,3] in [0,1] -> (h, s, v) each [..]; tf.image.rgb_to_hsv."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = v - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        v == r, ((g - b) / safe_d) % 6.0,
        jnp.where(v == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0))
    h = jnp.where(d > 0, h / 6.0, 0.0)
    s = jnp.where(v > 0, d / jnp.where(v > 0, v, 1.0), 0.0)
    return h, s, v


def _hsv_to_rgb(h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray):
    """(h, s, v) -> RGB [..,3] in [0,1]; tf.image.hsv_to_rgb."""
    h6 = h * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    conds = [i == k for k in range(6)]
    r = jnp.select(conds, [v, q, p, p, t, v])
    g = jnp.select(conds, [t, v, v, q, p, p])
    b = jnp.select(conds, [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_brightness(images: jnp.ndarray, delta) -> jnp.ndarray:
    """tf.image.adjust_brightness on [0,255] images; delta in [0,1] units
    (reference tf_random_brightness, generators.py:259-272)."""
    return jnp.clip(images + delta * 255.0, 0.0, 255.0)


def adjust_contrast(images: jnp.ndarray, factor) -> jnp.ndarray:
    """tf.image.adjust_contrast: scale around the PER-CHANNEL spatial mean
    (reference tf_random_contrast, generators.py:275-287)."""
    mean = jnp.mean(images, axis=(-3, -2), keepdims=True)
    return jnp.clip((images - mean) * factor + mean, 0.0, 255.0)


def adjust_saturation(images: jnp.ndarray, factor) -> jnp.ndarray:
    """tf.image.adjust_saturation: scale S in HSV space
    (reference tf_random_saturation, generators.py:290-302)."""
    h, s, v = _rgb_to_hsv(images / 255.0)
    s = jnp.clip(s * factor, 0.0, 1.0)
    return jnp.clip(_hsv_to_rgb(h, s, v) * 255.0, 0.0, 255.0)


def adjust_hue(images: jnp.ndarray, delta) -> jnp.ndarray:
    """tf.image.adjust_hue: rotate H in HSV space, wrapping mod 1
    (reference tf_random_hue, generators.py:305-317)."""
    h, s, v = _rgb_to_hsv(images / 255.0)
    h = (h + delta) % 1.0
    return jnp.clip(_hsv_to_rgb(h, s, v) * 255.0, 0.0, 255.0)


def to_grayscale(images: jnp.ndarray) -> jnp.ndarray:
    """tf.image.rgb_to_grayscale -> grayscale_to_rgb (ITU-R 601 luma;
    reference tf_random_grayscale, generators.py:320-344)."""
    gray = (0.2989 * images[..., 0:1] + 0.5870 * images[..., 1:2]
            + 0.1140 * images[..., 2:3])
    return jnp.broadcast_to(gray, images.shape)


def random_brightness(key, images, boxes, max_delta=0.2, prob=0.5):
    b = images.shape[0]
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1, (b, 1, 1, 1)) < prob
    delta = jax.random.uniform(
        k2, (b, 1, 1, 1), minval=-max_delta, maxval=max_delta)
    out = adjust_brightness(images, jnp.where(apply, delta, 0.0))
    return out, boxes


def random_contrast(key, images, boxes, lower=0.8, upper=1.2, prob=0.5):
    b = images.shape[0]
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1, (b, 1, 1, 1)) < prob
    factor = jax.random.uniform(k2, (b, 1, 1, 1), minval=lower, maxval=upper)
    out = adjust_contrast(images, jnp.where(apply, factor, 1.0))
    return out, boxes


def random_saturation(key, images, boxes, lower=0.8, upper=1.2, prob=0.5):
    b = images.shape[0]
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1, (b, 1, 1, 1)) < prob
    factor = jax.random.uniform(k2, (b, 1, 1, 1), minval=lower, maxval=upper)
    out = adjust_saturation(images, jnp.where(apply, factor, 1.0)[..., 0])
    return out, boxes


def random_hue(key, images, boxes, max_delta=0.1, prob=0.5):
    """Exact HSV hue rotation (tf.image.adjust_hue semantics); all
    elementwise min/max/select chains, so XLA fuses it into the
    surrounding augmentation program."""
    b = images.shape[0]
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1, (b, 1, 1, 1)) < prob
    delta = jax.random.uniform(
        k2, (b, 1, 1, 1), minval=-max_delta, maxval=max_delta)
    out = adjust_hue(images, jnp.where(apply, delta, 0.0)[..., 0])
    return out, boxes


def random_blur(key, images, boxes, prob=0.1):
    """Light 3x3 box blur (parity with the legacy PIL/imgaug blur augs,
    reference data/augmentation.py).  Depthwise conv on the VPU."""
    b = images.shape[0]
    apply = jax.random.uniform(key, (b, 1, 1, 1)) < prob
    pad = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='edge')
    acc = jnp.zeros_like(images)
    h, w = images.shape[1], images.shape[2]
    for dy in range(3):
        for dx in range(3):
            acc = acc + pad[:, dy:dy + h, dx:dx + w, :]
    blurred = acc / 9.0
    return jnp.where(apply, blurred, images), boxes


def random_sharpness(key, images, boxes, prob=0.1, max_alpha=0.8):
    """Unsharp-mask sharpening (legacy PIL sharpness aug parity)."""
    b = images.shape[0]
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1, (b, 1, 1, 1)) < prob
    alpha = jax.random.uniform(k2, (b, 1, 1, 1), minval=0.0,
                               maxval=max_alpha)
    pad = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='edge')
    acc = jnp.zeros_like(images)
    h, w = images.shape[1], images.shape[2]
    for dy in range(3):
        for dx in range(3):
            acc = acc + pad[:, dy:dy + h, dx:dx + w, :]
    blurred = acc / 9.0
    sharp = images + alpha * (images - blurred)
    out = jnp.where(apply, jnp.clip(sharp, 0.0, 255.0), images)
    return out, boxes


def random_motion_blur(key, images, boxes, prob=0.05, taps=5):
    """Directional 1-D blur in one of 4 directions (imgaug motion-blur
    parity, data/augmentation.py legacy path)."""
    b, h, w, _ = images.shape
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1, (b,)) < prob
    direction = jax.random.randint(k2, (b,), 0, 4)
    r = taps // 2
    pad = jnp.pad(images, ((0, 0), (r, r), (r, r), (0, 0)), mode='edge')
    shifts = {
        0: [(0, d) for d in range(-r, r + 1)],     # horizontal
        1: [(d, 0) for d in range(-r, r + 1)],     # vertical
        2: [(d, d) for d in range(-r, r + 1)],     # diagonal
        3: [(d, -d) for d in range(-r, r + 1)],    # anti-diagonal
    }
    variants = []
    for k in range(4):
        acc = jnp.zeros_like(images)
        for dy, dx in shifts[k]:
            acc = acc + pad[:, r + dy:r + dy + h, r + dx:r + dx + w, :]
        variants.append(acc / taps)
    stacked = jnp.stack(variants)                     # [4, B, H, W, 3]
    blurred = jnp.take_along_axis(
        stacked, direction[None, :, None, None, None], axis=0)[0]
    out = jnp.where(apply[:, None, None, None], blurred, images)
    return out, boxes


def random_rotate_any(key, images, boxes, prob=0.05, max_deg=15.0):
    """Arbitrary-angle rotation about the canvas center with gray fill
    (legacy cv2 warpAffine path, reference data/augmentation.py:405-489);
    boxes become the axis-aligned hull of their rotated corners."""
    b, h, w, _ = images.shape
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1, (b,)) < prob
    theta = jnp.where(
        apply,
        jax.random.uniform(k2, (b,), minval=-max_deg, maxval=max_deg)
        * jnp.pi / 180.0,
        0.0)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - (h - 1) / 2.0
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - (w - 1) / 2.0

    def one(img, bx, t):
        cos_t, sin_t = jnp.cos(t), jnp.sin(t)
        # inverse mapping: output pixel -> input coordinate
        src_x = cos_t * xs + sin_t * ys + (w - 1) / 2.0
        src_y = -sin_t * xs + cos_t * ys + (h - 1) / 2.0
        from jax.scipy.ndimage import map_coordinates
        channels = [
            map_coordinates(img[..., c] - GRAY_FILL, [src_y, src_x],
                            order=1, mode='constant', cval=0.0) + GRAY_FILL
            for c in range(3)]
        out = jnp.stack(channels, axis=-1)
        # rotate box corners (forward map) and take the AABB
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        x1, y1, x2, y2 = bx[:, 0], bx[:, 1], bx[:, 2], bx[:, 3]
        corners_x = jnp.stack([x1, x2, x1, x2], -1) - cx   # [N,4]
        corners_y = jnp.stack([y1, y1, y2, y2], -1) - cy
        rx = cos_t * corners_x - sin_t * corners_y + cx
        ry = sin_t * corners_x + cos_t * corners_y + cy
        nb = jnp.stack([rx.min(-1), ry.min(-1), rx.max(-1), ry.max(-1),
                        bx[:, 4]], -1)
        nb = _zero_dead(nb, _valid(bx))
        return out, nb

    out_img, out_box = jax.vmap(one)(images, boxes, theta)
    return out_img, _clip_filter(out_box, w, h)


def random_grayscale(key, images, boxes, prob=0.1):
    b = images.shape[0]
    apply = jax.random.uniform(key, (b, 1, 1, 1)) < prob
    out = jnp.where(apply, to_grayscale(images), images)
    return out, boxes


# ---------------------------------------------------------------------------
# Geometric ops.
# ---------------------------------------------------------------------------

def random_hflip(key, images, boxes, prob=0.5):
    """Horizontal flip + box transform (reference generators.py:227-257)."""
    b, _, w, _ = images.shape
    apply = jax.random.uniform(key, (b,)) < prob
    flipped = images[:, :, ::-1, :]
    out = jnp.where(apply[:, None, None, None], flipped, images)
    x1 = jnp.where(apply[:, None], w - boxes[..., 2], boxes[..., 0])
    x2 = jnp.where(apply[:, None], w - boxes[..., 0], boxes[..., 2])
    new_boxes = jnp.stack(
        [x1, boxes[..., 1], x2, boxes[..., 3], boxes[..., 4]], axis=-1)
    new_boxes = _zero_dead(new_boxes, _valid(boxes))
    return out, new_boxes


def random_vflip(key, images, boxes, prob=0.2):
    b, h, _, _ = images.shape
    apply = jax.random.uniform(key, (b,)) < prob
    flipped = images[:, ::-1, :, :]
    out = jnp.where(apply[:, None, None, None], flipped, images)
    y1 = jnp.where(apply[:, None], h - boxes[..., 3], boxes[..., 1])
    y2 = jnp.where(apply[:, None], h - boxes[..., 1], boxes[..., 3])
    new_boxes = jnp.stack(
        [boxes[..., 0], y1, boxes[..., 2], y2, boxes[..., 4]], axis=-1)
    new_boxes = _zero_dead(new_boxes, _valid(boxes))
    return out, new_boxes


def random_rotate90(key, images, boxes, prob=0.05):
    """Rotate by a random multiple of 90 degrees (reference rotates only in
    90-degree steps in its TF path, generators.py:465-558).  Assumes a
    square canvas (letterboxed inputs are square)."""
    b, h, w, _ = images.shape
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1, (b,)) < prob
    rot = jnp.where(apply, jax.random.randint(k2, (b,), 1, 4), 0)

    def rotate_one(img, bx, k):
        def r0(_):
            return img, bx
        def r90(_):  # counter-clockwise: (x,y)->(y, w-x)
            im = jnp.rot90(img, k=1, axes=(0, 1))
            x1, y1, x2, y2 = bx[..., 0], bx[..., 1], bx[..., 2], bx[..., 3]
            nb = jnp.stack([y1, w - x2, y2, w - x1, bx[..., 4]], -1)
            return im, nb
        def r180(_):
            im = jnp.rot90(img, k=2, axes=(0, 1))
            x1, y1, x2, y2 = bx[..., 0], bx[..., 1], bx[..., 2], bx[..., 3]
            nb = jnp.stack([w - x2, h - y2, w - x1, h - y1, bx[..., 4]], -1)
            return im, nb
        def r270(_):
            im = jnp.rot90(img, k=3, axes=(0, 1))
            x1, y1, x2, y2 = bx[..., 0], bx[..., 1], bx[..., 2], bx[..., 3]
            nb = jnp.stack([h - y2, x1, h - y1, x2, bx[..., 4]], -1)
            return im, nb
        return jax.lax.switch(k, [r0, r90, r180, r270], None)

    out_img, out_box = jax.vmap(rotate_one)(images, boxes, rot)
    out_box = _zero_dead(out_box, _valid(boxes))
    return out_img, out_box


def random_resize_crop_pad(key, images, boxes, scale_range=(0.7, 1.3),
                           aspect_range=(0.75, 1.333), prob=1.0):
    """Random zoom + aspect jitter + random placement with gray fill.

    On-device equivalent of the reference's tf_random_resize_crop_pad
    (generators.py:347-462): content is rescaled by (sx, sy) and shifted to
    a random position; areas outside the source are filled with gray 128.
    Implemented with ``jax.image.scale_and_translate`` vmapped per image.
    """
    b, h, w, _ = images.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    apply = jax.random.uniform(k1, (b,)) < prob
    scale = jax.random.uniform(
        k2, (b,), minval=scale_range[0], maxval=scale_range[1])
    aspect = jax.random.uniform(
        k3, (b,), minval=aspect_range[0], maxval=aspect_range[1])
    sx = jnp.where(apply, scale * jnp.sqrt(aspect), 1.0)
    sy = jnp.where(apply, scale / jnp.sqrt(aspect), 1.0)
    # random placement: content spans [t, t + s*dim); keep at least 50%
    # of the canvas covered when zoomed in/out
    max_tx = jnp.maximum(w - sx * w, 0.0) + 0.25 * w
    max_ty = jnp.maximum(h - sy * h, 0.0) + 0.25 * h
    u = jax.random.uniform(k4, (b, 2))
    tx = jnp.where(apply, u[:, 0] * max_tx - 0.125 * w, 0.0)
    ty = jnp.where(apply, u[:, 1] * max_ty - 0.125 * h, 0.0)

    def one(img, s_x, s_y, t_x, t_y):
        return jax.image.scale_and_translate(
            img - GRAY_FILL, (h, w, 3), (0, 1),
            jnp.stack([s_y, s_x]), jnp.stack([t_y, t_x]),
            method='linear') + GRAY_FILL

    out = jax.vmap(one)(images, sx, sy, tx, ty)
    out = jnp.clip(out, 0.0, 255.0)

    x1 = boxes[..., 0] * sx[:, None] + tx[:, None]
    x2 = boxes[..., 2] * sx[:, None] + tx[:, None]
    y1 = boxes[..., 1] * sy[:, None] + ty[:, None]
    y2 = boxes[..., 3] * sy[:, None] + ty[:, None]
    new_boxes = jnp.stack([x1, y1, x2, y2, boxes[..., 4]], axis=-1)
    new_boxes = _zero_dead(new_boxes, _valid(boxes))
    return out, _clip_filter(new_boxes, w, h)


# ---------------------------------------------------------------------------
# GridMask (reference generators.py:1164-1282): zero out a regular grid of
# squares; keep boxes whose visible fraction stays above `min_visible`.
# ---------------------------------------------------------------------------

def _integral_image(mask: jnp.ndarray) -> jnp.ndarray:
    """Summed-area table with a zero top/left border: [H+1, W+1]."""
    s = jnp.cumsum(jnp.cumsum(mask, axis=0), axis=1)
    return jnp.pad(s, ((1, 0), (1, 0)))


def random_gridmask(key, images, boxes, prob=0.1, ratio=0.5,
                    d_range=(40, 120), min_visible=0.3):
    b, h, w, _ = images.shape
    k1, k2, k3 = jax.random.split(key, 3)
    apply = jax.random.uniform(k1, (b,)) < prob
    d = jax.random.randint(k2, (b,), d_range[0], d_range[1] + 1)
    off = jax.random.randint(k3, (b, 2), 0, d_range[1])

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def one(img, bx, ap, dd, oo):
        hole = jnp.asarray(dd, jnp.float32) * ratio
        in_hole = ((((ys + oo[0]) % dd) < hole)
                   & (((xs + oo[1]) % dd) < hole))
        keep = jnp.where(ap, 1.0 - in_hole.astype(jnp.float32),
                         jnp.ones((h, w), jnp.float32))
        out = img * keep[..., None] + GRAY_FILL * (1.0 - keep[..., None])
        # box survival: visible fraction via summed-area table
        sat = _integral_image(keep)
        x1 = jnp.clip(bx[:, 0].astype(jnp.int32), 0, w)
        y1 = jnp.clip(bx[:, 1].astype(jnp.int32), 0, h)
        x2 = jnp.clip(bx[:, 2].astype(jnp.int32), 0, w)
        y2 = jnp.clip(bx[:, 3].astype(jnp.int32), 0, h)
        vis = (sat[y2, x2] - sat[y1, x2] - sat[y2, x1] + sat[y1, x1])
        area = jnp.maximum((x2 - x1) * (y2 - y1), 1).astype(jnp.float32)
        alive = _valid(bx) & ((vis / area) >= min_visible)
        return out, _zero_dead(bx, alive)

    return jax.vmap(one)(images, boxes, apply, d, off)


# ---------------------------------------------------------------------------
# Batch-level composites: Mosaic and MixUp.
# ---------------------------------------------------------------------------

def random_mosaic(key, images, boxes, prob=0.3, center_range=(0.3, 0.7)):
    """4-image mosaic (reference tf_random_mosaic, generators.py:561-1009).

    Each output image composites 4 batch neighbors (i, i+1, i+2, i+3 mod B)
    into quadrants split at a random center point; each source is rescaled
    to its quadrant, boxes transformed + clip-filtered.  Box capacity must
    already be expanded (x4) by the caller — mosaic concatenates the four
    quadrants' boxes into the fixed-capacity output by slot.
    """
    b, h, w, _ = images.shape
    n = boxes.shape[1]
    cap = n // 4
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1, (b,)) < prob
    cxy = jax.random.uniform(
        k2, (b, 2), minval=center_range[0], maxval=center_range[1])
    cx = cxy[:, 0] * w
    cy = cxy[:, 1] * h

    src = [images, jnp.roll(images, -1, 0), jnp.roll(images, -2, 0),
           jnp.roll(images, -3, 0)]
    src_boxes = [boxes, jnp.roll(boxes, -1, 0), jnp.roll(boxes, -2, 0),
                 jnp.roll(boxes, -3, 0)]

    def one(imgs4, boxes4, c_x, c_y, ap):
        # quadrant corners: (x0, y0, x1, y1) of each region
        quads = [(0.0, 0.0, c_x, c_y), (c_x, 0.0, float(w), c_y),
                 (0.0, c_y, c_x, float(h)), (c_x, c_y, float(w), float(h))]
        out = jnp.zeros((h, w, 3), jnp.float32)
        out_boxes = []
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        for q, (x0, y0, x1, y1) in enumerate(quads):
            s_x = (x1 - x0) / w
            s_y = (y1 - y0) / h
            scaled = jax.image.scale_and_translate(
                imgs4[q] - GRAY_FILL, (h, w, 3), (0, 1),
                jnp.stack([s_y, s_x]), jnp.stack([y0, x0]),
                method='linear') + GRAY_FILL
            in_q = ((xs >= x0) & (xs < x1) & (ys >= y0)
                    & (ys < y1))[..., None]
            out = jnp.where(in_q, scaled, out)
            bq = boxes4[q]
            nx1 = bq[:, 0] * s_x + x0
            nx2 = bq[:, 2] * s_x + x0
            ny1 = bq[:, 1] * s_y + y0
            ny2 = bq[:, 3] * s_y + y0
            nb = jnp.stack([jnp.clip(nx1, x0, x1), jnp.clip(ny1, y0, y1),
                            jnp.clip(nx2, x0, x1), jnp.clip(ny2, y0, y1),
                            bq[:, 4]], axis=-1)
            # min-size filter: max(10px, 3% of short quadrant side)
            min_sz = jnp.maximum(10.0, 0.03 * jnp.minimum(x1 - x0, y1 - y0))
            alive = (_valid(bq) & ((nb[:, 2] - nb[:, 0]) >= min_sz)
                     & ((nb[:, 3] - nb[:, 1]) >= min_sz))
            out_boxes.append(_zero_dead(nb, alive)[:cap])
        out_boxes = jnp.concatenate(out_boxes, axis=0)
        out_boxes = jnp.pad(out_boxes, ((0, n - 4 * cap), (0, 0)))
        return out, out_boxes

    m_img, m_box = jax.vmap(one)(
        jnp.stack(src, 1), jnp.stack(src_boxes, 1), cx, cy, apply)
    out_img = jnp.where(apply[:, None, None, None], m_img, images)
    out_box = jnp.where(apply[:, None, None], m_box, boxes)
    return out_img, out_box


def _pack_valid_front(boxes: jnp.ndarray) -> jnp.ndarray:
    """Stably move each image's valid box rows to the front of the
    capacity axis (invalid/zero rows sink to the back, order preserved)."""
    invalid = (~_valid(boxes)).astype(jnp.int32)
    order = jnp.argsort(invalid, axis=1, stable=True)
    return jnp.take_along_axis(boxes, order[..., None], axis=1)


def random_mixup(key, images, boxes, prob=0.1, alpha_range=(0.2, 0.8)):
    """Pairwise MixUp with the rolled batch (reference generators.py:
    1012-1161): blend with lambda in [0.2, 0.8], concatenate box lists.
    Capacity must be pre-expanded (x2).

    Valid boxes are packed to the front before halving: mosaic leaves each
    quadrant's boxes in its own capacity-slot section (slots [q*n/4,
    (q+1)*n/4)), so a naive ``boxes[:, :n//2]`` would silently drop the GT
    of quadrants 2-3 whenever mosaic and mixup fire on the same image.
    After packing, each side's valid boxes (<= n/2 by the x8/x2 capacity
    rule) always fit in its half — no truncation, matching the
    reference's explicit no-truncation assert (generators.py:1012+)."""
    b = images.shape[0]
    n = boxes.shape[1]
    half = n // 2
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1, (b,)) < prob
    lam = jax.random.uniform(
        k2, (b, 1, 1, 1), minval=alpha_range[0], maxval=alpha_range[1])
    other = jnp.roll(images, -1, 0)
    packed = _pack_valid_front(boxes)
    other_boxes = jnp.roll(packed, -1, 0)
    mixed = images * lam + other * (1.0 - lam)
    merged = jnp.concatenate([packed[:, :half], other_boxes[:, :half]],
                             axis=1)
    merged = jnp.pad(merged, ((0, 0), (0, n - 2 * half), (0, 0)))
    out_img = jnp.where(apply[:, None, None, None], mixed, images)
    out_box = jnp.where(apply[:, None, None], merged, boxes)
    return out_img, out_box


def random_copypaste(key, images, boxes, prob=0.15, max_paste=4):
    """On-device box-level copy-paste augmentation (SIGtor stand-in).

    The reference's original training used SIGtor, an external OFFLINE
    copy-paste tool that composites object crops into images before
    training (reference README.md:186-190).  This is the on-device,
    batched stand-in: with probability ``prob`` per image, up to
    ``max_paste`` ground-truth crops from the batch neighbor (i+1 mod B)
    are pasted at uniform random positions that keep the crop fully
    inside the canvas; the pasted boxes are appended in the LAST
    ``max_paste`` capacity slots (the caller must pre-pad capacity by
    ``max_paste`` — the pipeline does).  Existing GT whose centers get
    covered by a paste are zeroed out, mirroring mosaic's survival
    discipline.  Crops keep their source size (no rescale), like SIGtor's
    default paste mode.
    """
    b, h, w, _ = images.shape
    n = boxes.shape[1]
    donor_img = jnp.roll(images, -1, 0)
    donor_box = jnp.roll(boxes, -1, 0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    apply = jax.random.uniform(k1, (b,)) < prob
    # prefer valid donor boxes: noise + validity bonus, then top-k
    pri = (jax.random.uniform(k2, (b, n))
           + _valid(donor_box).astype(jnp.float32) * 2.0)
    _, sel = jax.lax.top_k(pri, max_paste)                 # [B, P]
    txy_u = jax.random.uniform(k3, (b, max_paste, 2))

    def one(img, bx, dimg, dbx, idx, u, ap):
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        out = img
        paste_rows = []
        rects = []
        for p in range(max_paste):
            db = dbx[idx[p]]
            bw = db[2] - db[0]
            bh = db[3] - db[1]
            ok = ap & (bw >= MIN_BOX_PX) & (bh >= MIN_BOX_PX)
            tx = u[p, 0] * jnp.maximum(w - bw, 0.0)
            ty = u[p, 1] * jnp.maximum(h - bh, 0.0)
            m = ((xs >= tx) & (xs < tx + bw)
                 & (ys >= ty) & (ys < ty + bh) & ok)[..., None]
            # whole-donor translate (gather-free, like mosaic's quadrant
            # compositing) so the crop's top-left lands at (tx, ty); the
            # rect mask then selects just the crop
            shifted = jax.image.scale_and_translate(
                dimg, (h, w, 3), (0, 1), jnp.ones((2,), jnp.float32),
                jnp.stack([ty - db[1], tx - db[0]]), method='linear')
            out = jnp.where(m, shifted, out)
            row = jnp.where(ok, jnp.stack(
                [tx, ty, tx + bw, ty + bh, db[4]]), jnp.zeros(5))
            paste_rows.append(row)
            rects.append((tx, ty, tx + bw, ty + bh, ok))
        # survival rule: drop originals whose centers a paste covers
        cx = (bx[:, 0] + bx[:, 2]) / 2.0
        cy = (bx[:, 1] + bx[:, 3]) / 2.0
        covered = jnp.zeros((n,), jnp.bool_)
        for tx, ty, tx2, ty2, ok in rects:
            covered = covered | ((cx >= tx) & (cx < tx2)
                                 & (cy >= ty) & (cy < ty2) & ok)
        kept = _zero_dead(bx, _valid(bx) & ~covered)
        # same test between pastes: a later paste that covers an earlier
        # pasted box's center occludes it (pastes composite in order), so
        # zero the earlier row instead of leaving occluded GT live
        rows = jnp.stack(paste_rows)
        pcx = (rows[:, 0] + rows[:, 2]) / 2.0
        pcy = (rows[:, 1] + rows[:, 3]) / 2.0
        p_iota = jnp.arange(max_paste)
        for q, (tx, ty, tx2, ty2, ok) in enumerate(rects):
            occl = ((p_iota < q) & (pcx >= tx) & (pcx < tx2)
                    & (pcy >= ty) & (pcy < ty2) & ok)
            rows = jnp.where(occl[:, None], 0.0, rows)
        out_bx = jnp.concatenate([kept[:n - max_paste], rows], axis=0)
        return out, out_bx

    p_img, p_box = jax.vmap(one)(images, boxes, donor_img, donor_box,
                                 sel, txy_u, apply)
    out_img = jnp.where(apply[:, None, None, None], p_img, images)
    out_box = jnp.where(apply[:, None, None], p_box, boxes)
    return out_img, out_box


def expand_box_capacity(boxes: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Pad the box axis by ``factor``x (reference generators.py:1983-2034)."""
    if factor <= 1:
        return boxes
    b, n, c = boxes.shape
    return jnp.pad(boxes, ((0, 0), (0, n * (factor - 1)), (0, 0)))


def normalize_images(images: jnp.ndarray) -> jnp.ndarray:
    """[0,255] -> [0,1] at the end of the chain (generators.py:212-224)."""
    return images / 255.0
