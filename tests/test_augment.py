"""On-device augmentation tests (ports the reference's aug test strategy:
box/image consistency per op, capacity discipline, mosaic/mixup count
preservation — SURVEY.md §4, tests/test_augmentations.py etc.)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigriddet_tpu.data import augment as A
from multigriddet_tpu.data import calculate_expansion_factor

H = W = 64
B, N = 4, 6


@pytest.fixture
def batch(rng):
    images = rng.randint(0, 255, (B, H, W, 3)).astype(np.float32)
    boxes = np.zeros((B, N, 5), np.float32)
    boxes[:, 0] = [10, 12, 40, 44, 1]
    boxes[:, 1] = [30, 5, 60, 30, 2]
    return jnp.asarray(images), jnp.asarray(boxes)


def test_hflip_box_transform(batch):
    images, boxes = batch
    out_img, out_box = jax.jit(
        lambda k, i, b: A.random_hflip(k, i, b, prob=1.0))(
            jax.random.PRNGKey(0), images, boxes)
    np.testing.assert_allclose(np.asarray(out_img),
                               np.asarray(images)[:, :, ::-1, :])
    np.testing.assert_allclose(np.asarray(out_box)[:, 0, 0], W - 40)
    np.testing.assert_allclose(np.asarray(out_box)[:, 0, 2], W - 10)
    # y untouched, class preserved
    np.testing.assert_allclose(np.asarray(out_box)[:, 0, 1], 12)
    np.testing.assert_allclose(np.asarray(out_box)[:, 0, 4], 1)


def test_rotate90_box_transform(batch):
    images, boxes = batch
    k = jax.random.PRNGKey(3)
    out_img, out_box = jax.jit(
        lambda k, i, b: A.random_rotate90(k, i, b, prob=1.0))(
            k, images, boxes)
    # every image rotated by some multiple of 90; box corners stay inside
    ob = np.asarray(out_box)
    valid = (ob[..., 2] - ob[..., 0]) > 0
    assert valid[:, :2].all()
    assert (ob[..., 0] >= -1e-3).all() and (ob[..., 2] <= W + 1e-3).all()
    # areas preserved under rotation
    area0 = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    area1 = (ob[..., 2] - ob[..., 0]) * (ob[..., 3] - ob[..., 1])
    np.testing.assert_allclose(np.asarray(area0)[:, :2], area1[:, :2],
                               rtol=1e-5)


def test_photometric_ops_leave_boxes(batch):
    images, boxes = batch
    key = jax.random.PRNGKey(1)

    @jax.jit
    def run(k, i, b):
        for fn in (A.random_brightness, A.random_contrast,
                   A.random_saturation, A.random_hue, A.random_grayscale):
            k, sub = jax.random.split(k)
            i, b = fn(sub, i, b)
        return i, b

    out_img, out_box = run(key, images, boxes)
    np.testing.assert_array_equal(np.asarray(out_box), np.asarray(boxes))
    assert float(jnp.min(out_img)) >= 0 and float(jnp.max(out_img)) <= 255


def test_resize_crop_pad_keeps_boxes_in_canvas(batch):
    images, boxes = batch
    out_img, out_box = jax.jit(
        lambda k, i, b: A.random_resize_crop_pad(k, i, b))(
            jax.random.PRNGKey(2), images, boxes)
    ob = np.asarray(out_box)
    assert (ob[..., 0] >= 0).all() and (ob[..., 2] <= W).all()
    assert (ob[..., 1] >= 0).all() and (ob[..., 3] <= H).all()
    assert out_img.shape == images.shape


def test_expansion_factor_rules():
    # reference generators.py:1492-1517
    assert calculate_expansion_factor(0.3, 0.1) == 8
    assert calculate_expansion_factor(0.3, 0.0) == 4
    assert calculate_expansion_factor(0.0, 0.1) == 2
    assert calculate_expansion_factor(0.0, 0.0) == 1


def test_mosaic_capacity_and_counts(batch):
    images, boxes = batch
    expanded = A.expand_box_capacity(boxes, 4)
    assert expanded.shape == (B, N * 4, 5)
    out_img, out_box = jax.jit(
        lambda k, i, b: A.random_mosaic(k, i, b, prob=1.0))(
            jax.random.PRNGKey(4), images, expanded)
    assert out_box.shape == expanded.shape
    assert out_img.shape == images.shape
    ob = np.asarray(out_box)
    # mosaic of 4 sources each with 2 valid boxes: some must survive
    n_valid = ((ob[..., 2] - ob[..., 0]) > 0).sum()
    assert n_valid > 0
    # all surviving boxes inside canvas
    alive = (ob[..., 2] - ob[..., 0]) > 0
    assert (ob[..., 0][alive] >= 0).all() and (ob[..., 2][alive] <= W).all()


def test_mixup_concatenates_boxes(batch):
    images, boxes = batch
    expanded = A.expand_box_capacity(boxes, 2)
    out_img, out_box = jax.jit(
        lambda k, i, b: A.random_mixup(k, i, b, prob=1.0))(
            jax.random.PRNGKey(5), images, expanded)
    ob = np.asarray(out_box)
    # each output has boxes of itself + neighbor = 4 valid
    n_valid = ((ob[..., 2] - ob[..., 0]) > 0).sum(axis=1)
    np.testing.assert_array_equal(n_valid, np.full(B, 4))


def test_gridmask_survival(batch):
    images, boxes = batch
    out_img, out_box = jax.jit(
        lambda k, i, b: A.random_gridmask(k, i, b, prob=1.0,
                                          d_range=(20, 30)))(
            jax.random.PRNGKey(6), images, boxes)
    ob = np.asarray(out_box)
    # surviving boxes keep original coordinates
    alive = (ob[..., 2] - ob[..., 0]) > 0
    orig = np.asarray(boxes)
    assert (ob[alive] == orig[alive]).all()


def test_sharpness_and_motion_blur_leave_boxes(batch):
    images, boxes = batch
    for fn in (A.random_sharpness, A.random_motion_blur):
        out_img, out_box = jax.jit(
            lambda k, i, b, f=fn: f(k, i, b, prob=1.0))(
                jax.random.PRNGKey(7), images, boxes)
        np.testing.assert_array_equal(np.asarray(out_box),
                                      np.asarray(boxes))
        assert float(jnp.min(out_img)) >= 0
        assert float(jnp.max(out_img)) <= 255
        # images actually changed
        assert not np.allclose(np.asarray(out_img), np.asarray(images))


def test_rotate_any_boxes_cover_content(batch):
    images, boxes = batch
    out_img, out_box = jax.jit(
        lambda k, i, b: A.random_rotate_any(k, i, b, prob=1.0,
                                            max_deg=20.0))(
            jax.random.PRNGKey(8), images, boxes)
    ob = np.asarray(out_box)
    orig = np.asarray(boxes)
    alive = (ob[..., 2] - ob[..., 0]) > 0
    assert alive[:, :2].any()
    # rotated AABBs are at least as large as the originals (hull property)
    w0 = orig[..., 2] - orig[..., 0]
    w1 = ob[..., 2] - ob[..., 0]
    assert (w1[alive] >= w0[alive] - 1.5).all()
    assert (ob[..., 0] >= -1e-3).all() and (ob[..., 2] <= W + 1e-3).all()


def test_copypaste_appends_donor_boxes(rng):
    p = 3
    images = np.zeros((B, H, W, 3), np.float32)
    for i in range(B):
        images[i] = (i + 1) * 20.0           # distinctive fill per image
    boxes = np.zeros((B, N + p, 5), np.float32)  # capacity pre-padded +p
    boxes[:, 0] = [10, 12, 40, 44, 1]
    boxes[:, 1] = [30, 5, 60, 30, 2]
    out_img, out_box = jax.jit(
        lambda k, i, b: A.random_copypaste(k, i, b, prob=1.0,
                                           max_paste=p))(
            jax.random.PRNGKey(9), jnp.asarray(images), jnp.asarray(boxes))
    oi, ob = np.asarray(out_img), np.asarray(out_box)
    for i in range(B):
        pastes = ob[i, -p:]
        alive = (pastes[:, 2] - pastes[:, 0]) > 0
        assert alive.any(), f'image {i}: no pastes landed'
        donor_fill = ((i + 1) % B + 1) * 20.0
        for row in pastes[alive]:
            x1, y1, x2, y2, cls = row
            # pasted boxes stay inside the canvas, keep donor class ids
            assert 0 <= x1 < x2 <= W + 1e-3 and 0 <= y1 < y2 <= H + 1e-3
            assert cls in (1.0, 2.0)
            # center pixel shows the donor image's fill value
            cy, cx = int((y1 + y2) / 2), int((x1 + x2) / 2)
            np.testing.assert_allclose(oi[i, cy, cx], donor_fill)
    # non-pasted pixels keep the target fill
    for i in range(B):
        assert (oi[i] == (i + 1) * 20.0).any()


def test_copypaste_survival_rule(rng):
    """Originals whose centers a paste covers are zeroed, not duplicated."""
    p = 2
    images = np.zeros((B, H, W, 3), np.float32)
    boxes = np.zeros((B, N + p, 5), np.float32)
    # one huge donor box -> any paste covers most of the canvas
    boxes[:, 0] = [1, 1, W - 1, H - 1, 3]
    out_img, out_box = jax.jit(
        lambda k, i, b: A.random_copypaste(k, i, b, prob=1.0,
                                           max_paste=p))(
            jax.random.PRNGKey(10), jnp.asarray(images), jnp.asarray(boxes))
    ob = np.asarray(out_box)
    for i in range(B):
        originals = ob[i, :N]
        alive = (originals[:, 2] - originals[:, 0]) > 0
        # the full-canvas paste covers the original's center -> dropped
        assert not alive.any()
        pastes = ob[i, -p:]
        assert ((pastes[:, 2] - pastes[:, 0]) > 0).any()


def test_copypaste_prob_zero_noop(batch):
    images, boxes = batch
    out_img, out_box = jax.jit(
        lambda k, i, b: A.random_copypaste(k, i, b, prob=0.0))(
            jax.random.PRNGKey(11), images, boxes)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(images))
    np.testing.assert_array_equal(np.asarray(out_box), np.asarray(boxes))


def test_copypaste_stacked_pastes_occlude(rng):
    """A later paste that covers an earlier pasted box's center zeroes the
    earlier row (pastes composite in order), so fully-occluded pasted GT
    never stays live."""
    p = 3
    images = np.zeros((B, H, W, 3), np.float32)
    boxes = np.zeros((B, N + p, 5), np.float32)
    # near-full-canvas donor boxes: every paste covers all earlier centers
    boxes[:, 0] = [1, 1, W - 1, H - 1, 3]
    boxes[:, 1] = [2, 2, W - 2, H - 2, 4]
    _, out_box = jax.jit(
        lambda k, i, b: A.random_copypaste(k, i, b, prob=1.0,
                                           max_paste=p))(
            jax.random.PRNGKey(12), jnp.asarray(images), jnp.asarray(boxes))
    ob = np.asarray(out_box)
    for i in range(B):
        pastes = ob[i, -p:]
        alive = (pastes[:, 2] - pastes[:, 0]) > 0
        # stacked near-full-canvas pastes occlude each other: exactly one
        # (the last VALID composite) survives — before the occlusion rule
        # every valid paste stayed live
        assert alive.sum() == 1


def test_mixup_preserves_mosaic_quadrant_boxes(batch):
    """Regression: mosaic leaves each quadrant's boxes in its own
    capacity-slot section (quadrants 2-3 live in the upper half), so
    mixup's halving must pack valid boxes to the front first — a naive
    ``boxes[:, :n//2]`` silently drops quadrant-2/3 ground truth whenever
    both augs fire (the objects stay in the pixels but train as
    background)."""
    images, boxes = batch
    expanded = A.expand_box_capacity(boxes, 8)  # mosaic+mixup rule
    k_mo, k_mi = jax.random.split(jax.random.PRNGKey(7))
    m_img, m_box = jax.jit(
        lambda k, i, b: A.random_mosaic(k, i, b, prob=1.0))(
            k_mo, images, expanded)
    _, out_box = jax.jit(
        lambda k, i, b: A.random_mixup(k, i, b, prob=1.0))(
            k_mi, m_img, m_box)
    mb, ob = np.asarray(m_box), np.asarray(out_box)

    def valid_rows(a):
        return [tuple(r) for r in a[(a[:, 2] - a[:, 0]) > 0]]

    half = mb.shape[1] // 2
    # the scenario must actually exercise the upper-half slots
    assert any(len(valid_rows(mb[i][half:])) for i in range(B))
    for i in range(B):
        expect = sorted(valid_rows(mb[i]) + valid_rows(mb[(i + 1) % B]))
        got = sorted(valid_rows(ob[i]))
        assert got == expect, f'image {i}: mixup dropped mosaic boxes'
