"""YCbCr 4:2:0 link transport: conversion math, loader mode, generator.

The yuv420 link format halves the bytes the host->device link carries
per image (data/annotations.py link_format, ops/yuv.py); the device
stage inverts it as its first fusable op.  These tests pin:
  * host conversion parity: native C++ (fastloader.cpp rgb_to_yuv420)
    == the numpy fallback to <= 1 count;
  * round-trip quality: decode->yuv420->device rgb stays closer to the
    native RGB decode than one JPEG re-save generation loss;
  * the letterbox gray bands survive exactly (128 maps to Y=128,
    neutral chroma);
  * the loader's yuv mode through RAM and disk caches;
  * generator: yuv420 and rgb streams agree on boxes/targets wherever
    pixels don't enter (and pixels agree within transport tolerance).
"""

import numpy as np
import pytest
from PIL import Image

from multigriddet_tpu.data import HostImageLoader, MultiGridDataGenerator
from multigriddet_tpu.data.native import yuv_available
from multigriddet_tpu.ops.yuv import rgb_to_yuv420_np, yuv420_to_rgb

ANCHORS = [np.array([[40, 40]], np.float32),
           np.array([[20, 20]], np.float32),
           np.array([[10, 10]], np.float32)]


@pytest.fixture(scope='module')
def files(tmp_path_factory):
    """Chroma-smooth JPEGs (bicubic-upscaled low-res noise) — the
    content class the 4:2:0 bound is meaningful for; raw per-pixel
    noise has no 4:2:0 representation to begin with."""
    root = tmp_path_factory.mktemp('yuv_imgs')
    rng = np.random.RandomState(7)
    lines = []
    for i in range(4):
        low = rng.randint(0, 255, (40, 50, 3)).astype('uint8')
        img = Image.fromarray(low).resize((200, 160), Image.BICUBIC)
        p = root / f'y{i}.jpg'
        img.save(p, quality=92)
        lines.append(f'{p} 10,10,80,70,{i % 3}')
    return lines


def test_numpy_matches_native_conversion(files):
    if not yuv_available():
        pytest.skip('native yuv loader unavailable')
    from multigriddet_tpu.data.native import (load_letterbox_batch,
                                              load_letterbox_yuv_batch)
    paths = [ln.split()[0] for ln in files]
    rgbs, metas, ok = load_letterbox_batch(paths, (64, 64))
    ys, cbs, crs, metas2, ok2 = load_letterbox_yuv_batch(paths, (64, 64))
    assert ok.all() and ok2.all()
    np.testing.assert_array_equal(metas, metas2)
    y2, cb2, cr2 = rgb_to_yuv420_np(rgbs)
    # float-association rounding may differ by 1 count on a few pixels
    for a, b in ((y2, ys), (cb2, cbs), (cr2, crs)):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_roundtrip_beats_jpeg_resave(files, tmp_path):
    """decode -> 4:2:0 transport -> device RGB must err less vs the
    native RGB decode than simply re-saving the JPEG at quality 92."""
    if not yuv_available():
        pytest.skip('native yuv loader unavailable')
    from multigriddet_tpu.data.native import (load_letterbox_batch,
                                              load_letterbox_yuv_batch)
    paths = [ln.split()[0] for ln in files]
    rgbs, _, _ = load_letterbox_batch(paths, (64, 64))
    ys, cbs, crs, _, _ = load_letterbox_yuv_batch(paths, (64, 64))
    via_yuv = np.asarray(yuv420_to_rgb(ys, cbs, crs))
    ref = rgbs.astype(np.float32)
    yuv_err = np.abs(via_yuv - ref).mean()
    resave_errs = []
    for i, p in enumerate(paths):
        rp = tmp_path / f'r{i}.jpg'
        Image.fromarray(rgbs[i]).save(rp, quality=92)
        resave_errs.append(np.abs(
            np.asarray(Image.open(rp)).astype(np.float32) - ref[i]).mean())
    assert yuv_err < np.mean(resave_errs), (yuv_err, np.mean(resave_errs))
    # luma is near-exact
    def luma(x):
        return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    assert np.abs(luma(via_yuv) - luma(ref)).mean() < 0.5


def test_gray_letterbox_bands_exact():
    gray = np.full((1, 64, 64, 3), 128, np.uint8)
    y, cb, cr = rgb_to_yuv420_np(gray)
    assert (y == 128).all() and (cb == 128).all() and (cr == 128).all()
    back = np.asarray(yuv420_to_rgb(y, cb, cr))
    np.testing.assert_array_equal(back, 128.0)


def test_loader_yuv_mode_with_caches(files, tmp_path):
    kw = dict(max_boxes=4, num_workers=2, link_format='yuv420')
    plain = HostImageLoader(files, (64, 64), **kw)
    (y1, cb1, cr1), b1 = plain.load_batch(files)
    assert y1.shape == (4, 64, 64) and cb1.shape == (4, 32, 32)
    ram = HostImageLoader(files, (64, 64), cache_images=True, **kw)
    (y2, cb2, cr2), b2 = ram.load_batch(files)
    (y3, cb3, cr3), b3 = ram.load_batch(files)  # served from RAM cache
    disk = HostImageLoader(files, (64, 64),
                           disk_cache_dir=str(tmp_path / 'dc'), **kw)
    disk.load_batch(files)                       # fills the disk cache
    (y4, cb4, cr4), b4 = disk.load_batch(files)  # served from disk
    for y, cb, cr, b in ((y2, cb2, cr2, b2), (y3, cb3, cr3, b3),
                         (y4, cb4, cr4, b4)):
        np.testing.assert_array_equal(y, y1)
        np.testing.assert_array_equal(cb, cb1)
        np.testing.assert_array_equal(cr, cr1)
        np.testing.assert_array_equal(b, b1)
    # disk keys are format-tagged: an rgb loader on the same dir misses
    rgb = HostImageLoader(files, (64, 64), max_boxes=4, num_workers=2,
                          disk_cache_dir=str(tmp_path / 'dc'))
    imgs, b5 = rgb.load_batch(files)
    assert imgs.shape == (4, 64, 64, 3)
    np.testing.assert_array_equal(b5, b1)
    for ld in (plain, ram, disk, rgb):
        ld.close()


def test_generator_yuv_vs_rgb_stream(tmp_path):
    """Same seed, both link formats: identical boxes and target
    assignment; pixels within the transport tolerance.  augment off so
    pixel differences cannot relocate any box.  Chroma-smooth content
    (flat color fields) — the class 4:2:0 represents exactly; the
    noisy-content bound lives in test_roundtrip_beats_jpeg_resave."""
    from PIL import ImageDraw
    rng = np.random.RandomState(5)
    lines = []
    for i in range(4):
        img = Image.new('RGB', (200, 160), tuple(rng.randint(30, 220, 3)))
        d = ImageDraw.Draw(img)
        d.rectangle([20, 20, 120, 100], fill=tuple(rng.randint(30, 220, 3)))
        p = tmp_path / f's{i}.jpg'
        img.save(p, quality=92)
        lines.append(f'{p} 20,20,120,100,{i % 3}')
    files = lines
    kw = dict(anchors=ANCHORS, num_classes=3, input_shape=(64, 64),
              batch_size=2, max_boxes=4, augment={'enabled': False},
              train=True, seed=3)
    g_yuv = MultiGridDataGenerator(files, link_format='yuv420', **kw)
    g_rgb = MultiGridDataGenerator(files, link_format='rgb', **kw)
    assert g_yuv.link_format == 'yuv420' and g_rgb.link_format == 'rgb'
    for (ia, ya, ba), (ib, yb, bb) in zip(g_yuv, g_rgb):
        np.testing.assert_array_equal(np.asarray(ba), np.asarray(bb))
        # normalized pixels within the 4:2:0 transport tolerance
        diff = np.abs(np.asarray(ia) - np.asarray(ib))
        assert diff.mean() < 0.02 and diff.max() <= 0.35
        for ta, tb in zip(ya, yb):
            ta, tb = np.asarray(ta), np.asarray(tb)
            # same cells assigned, same boxes/classes encoded
            np.testing.assert_array_equal(ta[..., 4], tb[..., 4])
            np.testing.assert_allclose(ta, tb, atol=1e-5)
    g_yuv.close()
    g_rgb.close()


def test_generator_auto_resolution(files):
    g_train = MultiGridDataGenerator(
        files, ANCHORS, 3, (64, 64), batch_size=2, max_boxes=4,
        augment={'enabled': False}, train=True)
    g_eval = MultiGridDataGenerator(
        files, ANCHORS, 3, (64, 64), batch_size=2, max_boxes=4,
        augment={'enabled': False}, train=False)
    assert g_train.link_format == 'yuv420'   # auto: train + even canvas
    assert g_eval.link_format == 'rgb'       # auto: eval keeps exact rgb
    g_train.close()
    g_eval.close()


def test_infer_step_yuv_matches_rgb():
    """make_infer_step(link_format='yuv420') takes (y, cb, cr) planes
    and inverts the transport on device.  On the one input the
    transport reconstructs bit-exactly (the all-128 letterbox gray,
    test_gray_letterbox_bands_exact) the two steps feed the model
    identical pixels, so the fused forward+decode+NMS outputs must
    agree — pinning the plumbing (argument order, /255 normalization,
    conversion placement)."""
    import jax.numpy as jnp

    from multigriddet_tpu.models import create_model
    from multigriddet_tpu.training.steps import (fetch_detections,
                                                 make_infer_step)
    model = create_model('multigriddet_mobile', num_classes=3)
    import jax
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    canvas = np.full((2, 64, 64, 3), 128, np.uint8)
    kw = dict(confidence=0.0, max_boxes=8, pre_nms_top_k=16)
    step_rgb = make_infer_step(model, ANCHORS, (64, 64), **kw)
    step_yuv = make_infer_step(model, ANCHORS, (64, 64),
                               link_format='yuv420', **kw)
    y, cb, cr = rgb_to_yuv420_np(canvas)
    b1, c1, s1, v1 = fetch_detections(step_rgb(variables,
                                               jnp.asarray(canvas)))
    b2, c2, s2, v2 = fetch_detections(step_yuv(
        variables, jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)))
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(c1[v1], c2[v2])
    np.testing.assert_allclose(s1[v1], s2[v2], atol=1e-4)
    np.testing.assert_allclose(b1[v1], b2[v2], atol=0.05)


def test_evaluator_yuv_auto(tmp_path):
    """MultiGridEvaluator defaults to the yuv420 transport on even
    canvases (evaluation.link_format: auto) and still produces finite
    mAP; link_format: rgb opts back out."""
    rng = np.random.RandomState(3)
    lines = []
    for i in range(3):
        img = Image.fromarray(
            rng.randint(0, 255, (20, 25, 3)).astype('uint8')
        ).resize((100, 80), Image.BICUBIC)
        p = tmp_path / f'e{i}.jpg'
        img.save(p, quality=92)
        lines.append(f'{p} 10,10,60,50,{i % 3}')
    ann = tmp_path / 'ann.txt'
    ann.write_text('\n'.join(lines) + '\n')
    from multigriddet_tpu.evaluation import MultiGridEvaluator
    anchor_path = tmp_path / 'anchors.txt'
    anchor_path.write_text('40,40\n20,20\n10,10\n')
    cfg = {
        'model': {'preset': {'architecture': 'multigriddet_mobile',
                             'num_classes': 3,
                             'input_shape': [64, 64, 3],
                             'anchors_path': str(anchor_path)}},
        'data': {'annotation': str(ann)},
        'evaluation': {'batch_size': 2, 'confidence_threshold': 0.0,
                       'save_results': False},
    }
    ev = MultiGridEvaluator(cfg)
    assert ev.link_format == 'yuv420'
    res = ev.evaluate()
    assert np.isfinite(res['mAP50'])
    cfg['evaluation']['link_format'] = 'rgb'
    ev2 = MultiGridEvaluator(cfg)
    assert ev2.link_format == 'rgb'
    res2 = ev2.evaluate()
    assert np.isfinite(res2['mAP50'])


def test_yuv_hbm_bank_halves_bytes(files):
    """The device image bank stores the yuv planes (1.5 B/px), so the
    same budget holds twice the images; epoch 2 gathers reproduce the
    stream exactly (bank content == what was transferred)."""
    kw = dict(anchors=ANCHORS, num_classes=3, input_shape=(64, 64),
              batch_size=2, max_boxes=4, augment={'enabled': True},
              train=True, seed=11, cache_images_device=True)
    plain = MultiGridDataGenerator(files, **kw)
    cached = MultiGridDataGenerator(files, **kw)
    def epoch(g):
        return [(np.asarray(i), [np.asarray(t) for t in y])
                for i, y, _ in g]
    e1p, e1c = epoch(plain), epoch(cached)
    assert cached._dcache.bytes == len(files) * (64 * 64 + 2 * 32 * 32)
    for e in range(2):  # epochs 2-3: bank path must equal host path
        ep, ec = epoch(plain), epoch(cached)
        for (ia, ya), (ib, yb) in zip(ep, ec):
            np.testing.assert_array_equal(ia, ib)
            for ta, tb in zip(ya, yb):
                np.testing.assert_array_equal(ta, tb)
    plain.close()
    cached.close()
