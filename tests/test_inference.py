"""Inference engine + decoder facade integration tests (tiny model).

Models the reference's tests/test_inference.py smoke strategy: build with
random weights, run the full detect path, check shape/type contracts.
"""

import numpy as np
import pytest
from PIL import Image

from multigriddet_tpu.inference import MultiGridInference
from multigriddet_tpu.postprocess import MultiGridDecoder


@pytest.fixture(scope='module')
def config(tmp_path_factory):
    root = tmp_path_factory.mktemp('inf')
    anchors = root / 'anchors.txt'
    anchors.write_text('40,40\n20,20\n10,10\n')
    classes = root / 'classes.txt'
    classes.write_text('a\nb\n')
    return {
        'model': {'type': 'preset', 'preset': {
            'architecture': 'multigriddet_tiny', 'num_classes': 2,
            'input_shape': [64, 64, 3], 'anchors_path': str(anchors),
            'classes_path': str(classes)}},
        'input': {'type': 'image', 'input_shape': [64, 64, 3]},
        'detection': {'confidence_threshold': 0.05,
                      'nms_threshold': 0.45, 'max_boxes': 10},
        'output': {'save_result': False},
    }


def test_engine_detect_contract(config, tmp_path):
    engine = MultiGridInference(config)
    img = Image.fromarray(
        np.random.RandomState(0).randint(
            0, 255, (48, 80, 3)).astype('uint8'))
    boxes, classes, scores = engine.detect(img)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert len(boxes) == len(classes) == len(scores)
    # boxes are in ORIGINAL image pixel space
    if len(boxes):
        assert (boxes[:, 0] + boxes[:, 2] <= 80 + 32).all()

    p = tmp_path / 'in.jpg'
    img.save(p)
    annotated, (b, c, s) = engine.predict_image(
        str(p), output_dir=str(tmp_path / 'out'))
    assert annotated.shape == (48, 80, 3)
    assert (tmp_path / 'out' / 'in.jpg').exists()


def test_engine_directory_mode(config, tmp_path):
    engine = MultiGridInference(config)
    d = tmp_path / 'imgs'
    d.mkdir()
    rng = np.random.RandomState(1)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3)).astype(
            'uint8')).save(d / f'{i}.jpg')
    results = engine.predict_directory(str(d), str(tmp_path / 'out'))
    assert len(results) == 2


def test_decoder_facade(config):
    rng = np.random.RandomState(2)
    anchors = [np.array([[40, 40]], np.float32),
               np.array([[20, 20]], np.float32),
               np.array([[10, 10]], np.float32)]
    dec = MultiGridDecoder(anchors, 2, (64, 64), confidence=0.1)
    preds = [rng.randn(1, g, g, 5 + 1 + 2).astype(np.float32) * 2
             for g in (2, 4, 8)]
    boxes, classes, scores = dec.postprocess(preds, (48, 80))
    assert boxes.shape[1] == 4 if len(boxes) else True
    # xyxy clipped to the original image
    if len(boxes):
        assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= 80).all()
        assert (boxes[:, 1] >= 0).all() and (boxes[:, 3] <= 48).all()
    # WBF variant runs
    dec_wbf = MultiGridDecoder(anchors, 2, (64, 64), confidence=0.1,
                               use_wbf=True)
    boxes2, classes2, scores2 = dec_wbf.postprocess(preds, (48, 80))
    assert len(boxes2) == len(scores2)


def test_detect_batch_serving(config):
    engine = MultiGridInference(config)
    rng = np.random.RandomState(3)
    imgs = [Image.fromarray(rng.randint(0, 255, (40 + 8 * i, 64, 3))
                            .astype('uint8')) for i in range(3)]
    results = engine.detect_batch(imgs, batch_size=2)
    assert len(results) == 3
    for b, c, s in results:
        assert len(b) == len(c) == len(s)


def test_detect_files_native_path(config, tmp_path):
    """detect_files (native C++ decode+letterbox -> fused device program)
    agrees with the PIL detect path per file, handles the non-multiple
    final chunk, and yields empty results for undecodable files."""
    engine = MultiGridInference(config)
    rng = np.random.RandomState(5)
    paths, pil_images = [], []
    for i in range(3):
        img = Image.fromarray(rng.randint(0, 255, (40 + 8 * i, 64, 3))
                              .astype('uint8'))
        p = tmp_path / f'f{i}.jpg'
        img.save(p, quality=95)
        paths.append(str(p))
        pil_images.append(Image.open(p))
    bad = tmp_path / 'broken.jpg'
    bad.write_bytes(b'not a jpeg')
    paths.append(str(bad))

    results = engine.detect_files(paths, batch_size=2)
    assert len(results) == 4
    b, c, s = results[-1]  # broken file -> empty result
    assert len(b) == len(c) == len(s) == 0
    pil_results = engine.detect_batch(pil_images, batch_size=2)
    for (fb, fc, fs), (pb, pc, ps) in zip(results[:3], pil_results):
        # same detections from either loader (same letterbox contract;
        # JPEG decode differences shift scores only microscopically)
        assert len(fb) == len(pb)
        if len(fb):
            np.testing.assert_allclose(fb, pb, atol=1.5)
            np.testing.assert_array_equal(fc, pc)


def test_video_mode(config, tmp_path):
    cv2 = pytest.importorskip('cv2')
    src = str(tmp_path / 'in.mp4')
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*'mp4v'), 5, (64, 48))
    rng = np.random.RandomState(4)
    for _ in range(4):
        w.write(rng.randint(0, 255, (48, 64, 3)).astype('uint8'))
    w.release()
    engine = MultiGridInference(config)
    out = str(tmp_path / 'out.mp4')
    frames = engine.predict_video(src, out, max_frames=3)
    assert frames == 3
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_video_config_reaches_predict_video(config, monkeypatch):
    """run() forwards video.batch_size / video.pipeline_depth from the
    config to predict_video (reference inference_engine.py:349-441
    dispatches on input.type; the batching knobs are ours)."""
    cfg = dict(config)
    cfg['input'] = {'type': 'video', 'source': 'dummy.mp4'}
    cfg['video'] = {'batch_size': 3, 'pipeline_depth': 1}
    engine = MultiGridInference(cfg)
    seen = {}

    def fake(source, out_path=None, **kw):
        seen.update(kw, source=source)
        return 0

    monkeypatch.setattr(engine, 'predict_video', fake)
    engine.run()
    assert seen['source'] == 'dummy.mp4'
    assert seen['batch_size'] == 3
    assert seen['pipeline_depth'] == 1


def test_camera_dispatch_source_and_show(config, monkeypatch):
    """run() with input.type=camera takes the device id from input.source
    when numeric ("--input 1", reference inference_engine.py:349-441),
    falls back to camera.device_id otherwise, and forwards
    output.show_result."""
    cases = [
        # (input.source, camera block, expected device)
        ('1', {}, 1),
        (None, {'device_id': 2}, 2),
        ('not-a-number', {'device_id': 3}, 3),
    ]
    for source, cam, want in cases:
        cfg = dict(config)
        cfg['input'] = {'type': 'camera', 'source': source}
        cfg['camera'] = cam
        cfg['output'] = {'show_result': False}
        engine = MultiGridInference(cfg)
        seen = {}

        def fake(device, show=True):
            seen.update(device=device, show=show)
            return 0

        monkeypatch.setattr(engine, 'predict_camera', fake)
        engine.run()
        assert seen['device'] == want, (source, cam)
        assert seen['show'] is False


def test_engine_nms_backend_and_pool_knobs(config):
    """detection.nms_backend / pre_nms_top_k reach the fused step and the
    pallas backend produces the same detections as the xla default."""
    outs = {}
    for backend in ('xla', 'pallas'):
        cfg = dict(config)
        cfg['detection'] = dict(config['detection'],
                                nms_backend=backend, pre_nms_top_k=96)
        engine = MultiGridInference(cfg)
        assert engine.nms_backend == backend
        assert engine.pre_nms_top_k == 96
        img = Image.fromarray(
            np.random.RandomState(3).randint(
                0, 255, (64, 64, 3)).astype('uint8'))
        outs[backend] = engine.detect(img)
    bx, bc, bs = outs['xla']
    px, pc, ps = outs['pallas']
    assert len(bx) == len(px)
    if len(bx):
        np.testing.assert_allclose(np.asarray(bx), np.asarray(px),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(bc), np.asarray(pc))


def test_engine_use_wbf_changes_outputs(config):
    """detection.use_wbf is honored end to end (reference
    inference_engine.py:126-135): the fused step returns the candidate
    pool instead of NMS keeps, and the host fuses overlapping same-class
    candidates into weighted-average boxes."""
    det = dict(config['detection'], confidence_threshold=0.01,
               nms_threshold=0.3)
    cfg_wbf = dict(config, detection=dict(det, use_wbf=True))
    eng = MultiGridInference(cfg_wbf)
    assert eng.use_wbf
    # the infer step now yields the full confidence-filtered pool
    # (84 predictions at 64x64: 2x2 + 4x4 + 8x8 cells x 1 anchor)
    import jax.numpy as jnp

    from multigriddet_tpu.training.steps import fetch_detections
    dummy = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    bxs, cls, scs, valid = fetch_detections(
        eng._infer(eng.variables, dummy))
    assert bxs.shape[1] == 84  # pool, not max_boxes
    # host fusion: two heavily-overlapping same-class candidates merge
    # into one weighted-average box; the isolated one survives untouched
    boxes = np.array([[10, 10, 20, 20], [12, 12, 20, 20],
                      [50, 50, 8, 8]], np.float32)
    scores = np.array([0.9, 0.3, 0.5], np.float32)
    classes = np.array([1, 1, 1], np.int32)
    fb, fc, fs = eng._host_fuse(boxes, classes, scores)
    assert len(fb) == 2
    w = scores[:2] / scores[:2].sum()
    np.testing.assert_allclose(
        fb[0], boxes[0] * w[0] + boxes[1] * w[1], rtol=1e-5)
    np.testing.assert_allclose(fs[0], scores[:2].mean(), rtol=1e-6)
    np.testing.assert_allclose(fb[1], boxes[2])
    # end-to-end detect respects the max_boxes budget and stays sorted
    img = Image.fromarray(
        np.random.RandomState(7).randint(
            0, 255, (64, 64, 3)).astype('uint8'))
    b2, c2, s2 = eng.detect(img)
    assert len(b2) <= eng.max_boxes
    if len(s2) > 1:
        assert (np.diff(s2) <= 1e-6).all()


def test_engine_wbf_mode_reference(config):
    """detection.wbf_mode='reference' selects the exact reference twin:
    seed-box clustering instead of the running average.  On a chain
    A~B~C (adjacent IoU above threshold, A~C below) the reference seeds
    at the highest-score box and absorbs only direct overlaps, while the
    paper mode's drifting representative can merge the whole chain."""
    det = dict(config['detection'], use_wbf=True, nms_threshold=0.3,
               confidence_threshold=0.01)
    eng_ref = MultiGridInference(dict(config, detection=dict(
        det, wbf_mode='reference')))
    eng_pap = MultiGridInference(dict(config, detection=dict(det)))
    assert eng_ref.wbf_mode == 'reference' and eng_pap.wbf_mode == 'paper'
    # top score in the middle of a chain: A(x=0, 0.8) B(x=50, 0.9)
    # C(x=95, 0.7); IoU(B,A)=0.333, IoU(B,C)=0.379, IoU(A,C)=0.026
    boxes = np.asarray([[0, 100, 100, 80], [50, 100, 100, 80],
                        [95, 100, 100, 80], [300, 100, 100, 80],
                        [330, 100, 100, 80]], np.float32)
    scores = np.asarray([0.8, 0.9, 0.7, 0.6, 0.5], np.float32)
    classes = np.zeros(5, np.int32)
    rb, rc, rs = eng_ref._host_fuse(boxes, classes, scores)
    pb, pc, ps = eng_pap._host_fuse(boxes, classes, scores)
    # reference seeds at B and absorbs BOTH neighbors -> {A,B,C} + {D,E};
    # paper's representative drifts toward A after the first join and
    # rejects C (IoU 0.187 < 0.3) -> {A,B}, {C}, {D,E}
    assert len(rb) == 2
    assert len(pb) == 3


def test_detect_files_yuv_transport(config, tmp_path):
    """detection.link_format: yuv420 serves detect_files over the
    half-bandwidth 4:2:0 transport; detections stay within the
    transport tolerance of the rgb path (smooth content) and the
    non-JPEG/undecodable contracts hold unchanged."""
    engine_rgb = MultiGridInference(config)
    cfg = dict(config)
    cfg['detection'] = dict(config['detection'], link_format='yuv420')
    engine_yuv = MultiGridInference(cfg)
    assert engine_yuv._infer_yuv is not None
    rng = np.random.RandomState(9)
    paths = []
    for i in range(3):
        low = rng.randint(0, 255, (16, 20, 3)).astype('uint8')
        img = Image.fromarray(low).resize((80, 64), Image.BICUBIC)
        p = tmp_path / f'y{i}.jpg'
        img.save(p, quality=95)
        paths.append(str(p))
    bad = tmp_path / 'broken.jpg'
    bad.write_bytes(b'not a jpeg')
    paths.append(str(bad))
    r_yuv = engine_yuv.detect_files(paths, batch_size=2)
    r_rgb = engine_rgb.detect_files(paths, batch_size=2)
    assert len(r_yuv) == len(r_rgb) == 4
    assert len(r_yuv[-1][0]) == 0  # broken file stays empty
    # random weights make NMS rank-order sensitive to the transport's
    # small pixel perturbation, so compare as SETS: most yuv detections
    # must sit within a few px of some rgb detection
    matched = total = 0
    for (yb, yc, ys), (rb, rc, rs) in zip(r_yuv[:3], r_rgb[:3]):
        for box in yb:
            total += 1
            if len(rb) and np.abs(rb - box[None]).max(axis=1).min() < 8.0:
                matched += 1
    assert total == 0 or matched / total > 0.5, (matched, total)


def test_detect_files_pil_fallback_bad_files(config, tmp_path, monkeypatch):
    """Without the native loader, detect_files must keep its contract:
    one result per path, empty results for unreadable/corrupt files
    (instead of raising on the first bad path)."""
    import multigriddet_tpu.data.native as native_mod
    monkeypatch.setattr(native_mod, 'native_available', lambda: False)
    engine = MultiGridInference(config)
    rng = np.random.RandomState(9)
    good = tmp_path / 'good.jpg'
    Image.fromarray(rng.randint(0, 255, (40, 64, 3))
                    .astype('uint8')).save(good)
    corrupt = tmp_path / 'corrupt.jpg'
    corrupt.write_bytes(b'not a jpeg')
    missing = tmp_path / 'missing.jpg'
    paths = [str(corrupt), str(good), str(missing)]
    results = engine.detect_files(paths, batch_size=2)
    assert len(results) == 3
    for idx in (0, 2):
        b, c, s = results[idx]
        assert len(b) == len(c) == len(s) == 0
    gb, gc, gs = results[1]
    pb, pc, ps = engine.detect(Image.open(good))
    assert len(gb) == len(pb)
    if len(gb):
        np.testing.assert_allclose(gb, pb, atol=1e-4)


def test_detect_batch_depth_zero_is_synchronous(config):
    """pipeline_depth=0 keeps nothing in flight (matching predict_video's
    semantics for the same knob) and yields identical results."""
    engine = MultiGridInference(config)
    rng = np.random.RandomState(11)
    imgs = [Image.fromarray(rng.randint(0, 255, (40, 64, 3))
                            .astype('uint8')) for _ in range(3)]
    sync = engine.detect_batch(imgs, batch_size=2, pipeline_depth=0)
    deep = engine.detect_batch(imgs, batch_size=2, pipeline_depth=4)
    assert len(sync) == len(deep) == 3
    for (sb, sc, ss), (db, dc, ds) in zip(sync, deep):
        np.testing.assert_allclose(np.asarray(sb), np.asarray(db))
        np.testing.assert_array_equal(np.asarray(sc), np.asarray(dc))


def test_video_pipelining_frame_integrity(config, tmp_path, monkeypatch):
    """Pipelined video chunks must not share the staging buffer with
    in-flight transfers: per-frame detections with pipeline_depth=2 must
    equal the synchronous depth-0 run (same batch size, so identical
    numerics).  On the CPU backend jnp.asarray can alias numpy memory, so
    a reused buffer shows up as torn frames here."""
    cv2 = pytest.importorskip('cv2')
    src = str(tmp_path / 'in.mp4')
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*'mp4v'), 5, (64, 48))
    rng = np.random.RandomState(6)
    for _ in range(6):
        w.write(rng.randint(0, 255, (48, 64, 3)).astype('uint8'))
    w.release()
    engine = MultiGridInference(config)
    orig_fuse = engine._host_fuse
    collected = []

    def spy(boxes, classes, scores):
        collected.append((np.array(boxes), np.array(classes),
                          np.array(scores)))
        return orig_fuse(boxes, classes, scores)

    monkeypatch.setattr(engine, '_host_fuse', spy)
    runs = []
    for depth in (0, 2):
        collected.clear()
        engine.predict_video(src, str(tmp_path / f'o{depth}.mp4'),
                             pipeline_depth=depth, batch_size=2)
        runs.append(list(collected))
    assert len(runs[0]) == len(runs[1]) == 6
    for (b0, c0, s0), (b1, c1, s1) in zip(*runs):
        np.testing.assert_allclose(b0, b1)
        np.testing.assert_array_equal(c0, c1)
        np.testing.assert_allclose(s0, s1)


def test_detect_files_native_path_handles_png(config, tmp_path):
    """The native loader decodes JPEG only; a non-JPEG list must route to
    the batched PIL path (not fail every native pass), and a PNG saved
    under a .jpg name — which defeats the extension gate — must still get
    real detections via the per-slot PIL retry, not a silent empty."""
    from multigriddet_tpu.data.native import native_available
    if not native_available():
        pytest.skip('native loader not built')
    engine = MultiGridInference(config)
    rng = np.random.RandomState(13)
    arr = rng.randint(0, 255, (40, 64, 3)).astype('uint8')
    png = tmp_path / 'img.png'
    Image.fromarray(arr).save(png)
    jpg = tmp_path / 'img.jpg'
    Image.fromarray(rng.randint(0, 255, (40, 64, 3))
                    .astype('uint8')).save(jpg)
    results = engine.detect_files([str(png), str(jpg)], batch_size=2)
    assert len(results) == 2
    pb, pc, ps = engine.detect(Image.open(png))
    nb, nc, ns = results[0]
    assert len(nb) == len(pb)
    if len(nb):
        np.testing.assert_allclose(nb, pb, atol=1e-4)
        np.testing.assert_array_equal(nc, pc)

    # a PNG disguised as .jpg passes the extension gate, fails libjpeg,
    # and must be recovered by the native path's per-slot PIL retry
    fake_jpg = tmp_path / 'disguised.jpg'
    Image.fromarray(arr).save(fake_jpg, format='PNG')
    results2 = engine.detect_files([str(fake_jpg), str(jpg)], batch_size=2)
    db = results2[0][0]
    assert len(db) == len(pb)
    if len(db):
        np.testing.assert_allclose(db, pb, atol=1e-4)


def test_bf16_default_and_f32_parity(config):
    """Serving builds bfloat16 compute by default (environment.mixed_precision,
    reference evaluator.py:50-54 honors the same knob) and its detections
    match the float32 model within bf16 rounding tolerance — predict convs
    and decode/NMS stay float32 (models/layers.py PredictConv)."""
    import jax
    import jax.numpy as jnp

    eng_bf16 = MultiGridInference(config)
    assert eng_bf16.compute_dtype == jnp.bfloat16
    cfg32 = dict(config, environment={'mixed_precision': False})
    eng_f32 = MultiGridInference(cfg32)
    assert eng_f32.compute_dtype == jnp.float32

    # identical init key => identical (float32) params in both engines
    chex = pytest.importorskip('chex')
    chex.assert_trees_all_close(eng_bf16.variables, eng_f32.variables)

    # raw forward outputs agree to bf16 rounding; predict-conv output
    # dtype stays float32 in the mixed model
    img = np.random.RandomState(7).randint(
        0, 255, (1, 64, 64, 3)).astype(np.float32) / 255.0
    outs16 = jax.jit(lambda v, x: eng_bf16.model.apply(v, x, train=False))(
        eng_bf16.variables, jnp.asarray(img))
    outs32 = jax.jit(lambda v, x: eng_f32.model.apply(v, x, train=False))(
        eng_f32.variables, jnp.asarray(img))
    for o16, o32 in zip(outs16, outs32):
        assert o16.dtype == jnp.float32
        scale = float(jnp.max(jnp.abs(o32))) + 1e-6
        assert float(jnp.max(jnp.abs(o16 - o32))) / scale < 0.08

    # end-to-end detections: same count within 1 near-threshold flip and
    # matching top-1 box/score when anything is detected
    pil = Image.fromarray(np.random.RandomState(3).randint(
        0, 255, (48, 80, 3)).astype('uint8'))
    b16, c16, s16 = eng_bf16.detect(pil)
    b32, c32, s32 = eng_f32.detect(pil)
    assert abs(len(b16) - len(b32)) <= 1
    if len(b16) and len(b32):
        np.testing.assert_allclose(b16[0], b32[0], rtol=0.1, atol=2.0)
        assert abs(float(s16[0]) - float(s32[0])) < 0.05
        assert c16[0] == c32[0]


def test_camera_resolution_applied(config, monkeypatch):
    """camera.resolution sets CAP_PROP_FRAME_WIDTH/HEIGHT on the capture
    (reference inference_engine.py:264-266); video files don't get it."""
    cv2 = pytest.importorskip('cv2')

    calls = []

    class FakeCap:
        def __init__(self, source):
            self.source = source

        def isOpened(self):
            return True

        def set(self, prop, value):
            calls.append((prop, value))

        def read(self):
            return False, None  # empty stream: loop exits immediately

        def get(self, prop):
            return 0

        def release(self):
            pass

    cfg = dict(config)
    cfg['camera'] = {'device_id': 0, 'resolution': [1280, 720]}
    engine = MultiGridInference(cfg)
    monkeypatch.setattr(cv2, 'VideoCapture', lambda src: FakeCap(src))
    engine.predict_camera(0, show=False, max_frames=1)
    assert (cv2.CAP_PROP_FRAME_WIDTH, 1280) in calls
    assert (cv2.CAP_PROP_FRAME_HEIGHT, 720) in calls

    # a plain video call (no resolution) must not touch capture props
    calls.clear()
    engine.predict_video('x.mp4', None, show=False, max_frames=1)
    assert not calls
