"""Native C++ fastloader tests: parity with the PIL letterbox contract,
bad-file fallback, and integration through HostImageLoader."""

import numpy as np
import pytest
from PIL import Image

from multigriddet_tpu.data import HostImageLoader
from multigriddet_tpu.data.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason='native loader not built')


@pytest.fixture(scope='module')
def jpegs(tmp_path_factory):
    root = tmp_path_factory.mktemp('jp')
    rng = np.random.RandomState(0)
    lines = []
    for i, (h, w) in enumerate([(480, 640), (300, 200), (64, 64)]):
        arr = np.zeros((h, w, 3), np.uint8)
        arr[h // 4: h // 2, w // 4: w // 2] = [255, 0, 0]  # smooth content
        p = root / f'{i}.jpg'
        Image.fromarray(arr).save(p, quality=95)
        lines.append(f'{p} 10,10,50,40,1')
    return lines


def test_native_matches_letterbox_geometry(jpegs):
    from multigriddet_tpu.data.native import load_letterbox_batch
    from multigriddet_tpu.data.annotations import (letterbox_image,
                                                   parse_annotation_line)
    paths = [parse_annotation_line(l)[0] for l in jpegs]
    imgs, metas, ok = load_letterbox_batch(paths, (128, 128))
    assert ok.all()
    for i, p in enumerate(paths):
        ref, scale, pad_x, pad_y = letterbox_image(
            Image.open(p).convert('RGB'), (128, 128))
        np.testing.assert_allclose(metas[i, 0], scale, rtol=1e-5)
        assert int(metas[i, 1]) == pad_x and int(metas[i, 2]) == pad_y
        # content parity within interpolation tolerance (bilinear vs
        # bicubic) on smooth images
        diff = np.abs(imgs[i].astype(int) - ref.astype(int)).mean()
        assert diff < 6.0, diff


def test_host_loader_native_path_boxes(jpegs):
    loader = HostImageLoader(jpegs, (128, 128), max_boxes=3)
    assert loader.use_native
    imgs, boxes = loader.load_batch(jpegs)
    assert imgs.shape == (3, 128, 128, 3)
    # box transform: image 0 is 640x480 -> scale 0.2, pad_y 16
    np.testing.assert_allclose(boxes[0, 0, 0], 10 * 0.2, atol=0.5)
    np.testing.assert_allclose(boxes[0, 0, 1], 10 * 0.2 + 16, atol=0.5)
    assert boxes[0, 0, 4] == 1
    loader.close()


def test_host_loader_native_bad_file_fallback(jpegs, tmp_path):
    bad = tmp_path / 'corrupt.jpg'
    bad.write_bytes(b'not a jpeg at all')
    lines = [jpegs[0], f'{bad} 1,1,5,5,0']
    loader = HostImageLoader(lines, (64, 64), max_boxes=2)
    imgs, boxes = loader.load_batch(lines)
    assert imgs.shape == (2, 64, 64, 3)
    # corrupt file -> gray frame, no boxes (PIL fallback also fails -> safe)
    assert (imgs[1] == 128).all()
    assert (boxes[1] == 0).all()
    loader.close()


def test_native_rounding_ties_match_pil(tmp_path):
    """Exact .5 resize ties must round like Python round()/np.round
    (half-to-even): a 73x128 image letterboxed to 64x64 has content width
    73*64/128 = 36.5 -> 36, not lround's 37 — a mismatch shifts content
    one pixel against the letterbox inverse."""
    from multigriddet_tpu.data.annotations import letterbox_image
    from multigriddet_tpu.data.native import load_letterbox_batch
    arr = np.full((128, 73, 3), 200, np.uint8)
    p = tmp_path / 'tie.jpg'
    Image.fromarray(arr).save(p, quality=95)
    imgs, metas, ok = load_letterbox_batch([str(p)], (64, 64))
    assert ok.all()
    ref, scale, pad_x, pad_y = letterbox_image(
        Image.open(p).convert('RGB'), (64, 64))
    assert int(metas[0, 1]) == pad_x == 14  # (64 - 36) // 2
    # identical gray-padding geometry: columns outside the content are
    # exactly 128 in both paths
    np.testing.assert_array_equal(imgs[0][:, :pad_x], 128)
    np.testing.assert_array_equal(imgs[0][:, pad_x + 36:], 128)
    np.testing.assert_array_equal(ref[:, :pad_x], 128)
    np.testing.assert_array_equal(ref[:, pad_x + 36:], 128)
