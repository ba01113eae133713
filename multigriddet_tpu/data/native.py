"""ctypes bindings for the native C++ host loader (native/fastloader.cpp).

Builds the shared library on first use (g++ + system libjpeg) and falls
back cleanly to the PIL path when unavailable.  The native loader decodes
JPEGs with DCT-domain downscaling and letterboxes on true OS threads (no
GIL), replacing the reference's thread-pooled PIL loading
(multigriddet/data/generators.py:1639-1696).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', '..', 'native')
_LIB_PATH = os.path.abspath(
    os.path.join(_NATIVE_DIR, 'libmgdfastloader.so'))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(['make', '-C', os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mgd_load_letterbox_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    lib.mgd_load_letterbox_batch.restype = None
    try:
        lib.mgd_load_letterbox_yuv_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int]
        lib.mgd_load_letterbox_yuv_batch.restype = None
    except AttributeError:  # stale .so without the YUV entry point
        pass
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def load_letterbox_batch(paths: Sequence[str], target_hw: Tuple[int, int],
                         nthreads: int = 8):
    """Decode + letterbox a batch natively.

    Returns (images [N, th, tw, 3] u8, metas [N, 5] f32
    (scale, pad_x, pad_y, full_w, full_h), ok [N] bool).
    Raises RuntimeError if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError('native fastloader unavailable')
    th, tw = target_hw
    n = len(paths)
    # zeros, not empty: a fresh np.empty mmap faults its pages on first
    # write inside the C call, and on this VM that first-touch path is
    # pathologically slow (measured 256x416x416x3: 9.3 s empty vs 1.3 s
    # zeros/calloc — 7x on the whole batch).  calloc's pre-zeroed pages
    # skip it.
    images = np.zeros((n, th, tw, 3), np.uint8)
    metas = np.zeros((n, 5), np.float32)
    status = np.zeros((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(
        *[p.encode('utf-8') for p in paths])
    lib.mgd_load_letterbox_batch(
        c_paths, n, th, tw,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        metas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        nthreads)
    return images, metas, status == 0


def yuv_available() -> bool:
    lib = get_lib()
    return lib is not None and hasattr(lib, 'mgd_load_letterbox_yuv_batch')


def load_letterbox_yuv_batch(paths: Sequence[str],
                             target_hw: Tuple[int, int],
                             nthreads: int = 8):
    """Decode + letterbox + convert to planar YCbCr 4:2:0 natively.

    Returns (y [N, th, tw] u8, cb [N, th/2, tw/2] u8, cr u8,
    metas [N, 5] f32, ok [N] bool).  Halves the bytes the device link
    carries per image; the device inverts it (ops/yuv.py).  th and tw
    must be even.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, 'mgd_load_letterbox_yuv_batch'):
        raise RuntimeError('native YUV fastloader unavailable')
    th, tw = target_hw
    if th % 2 or tw % 2:
        raise ValueError(f'canvas must be even for 4:2:0, got {th}x{tw}')
    n = len(paths)
    # zeros (calloc), not empty: see load_letterbox_batch
    ys = np.zeros((n, th, tw), np.uint8)
    cbs = np.zeros((n, th // 2, tw // 2), np.uint8)
    crs = np.zeros((n, th // 2, tw // 2), np.uint8)
    metas = np.zeros((n, 5), np.float32)
    status = np.zeros((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode('utf-8') for p in paths])
    lib.mgd_load_letterbox_yuv_batch(
        c_paths, n, th, tw,
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cbs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        crs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        metas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        nthreads)
    return ys, cbs, crs, metas, status == 0
