"""YCbCr 4:2:0 link transport: host packs, device unpacks.

The streaming input pipeline's steady state is bound by the
host->device link carrying one decoded u8 RGB batch per step (measured
~0.15 GB/s on the tunneled chip — docs/STATUS.md round 5).  JPEG files
are already chroma-subsampled 4:2:0, so shipping planar YCbCr 4:2:0
instead of RGB halves the link bytes (1.5 vs 3 B/px) while losing
essentially nothing the file ever had.  The host side (native
fastloader.cpp rgb_to_yuv420, or :func:`rgb_to_yuv420_np` for the PIL
fallback) box-averages chroma 2x2; the device side
(:func:`yuv420_to_rgb`) upsamples nearest and inverts the BT.601
full-range matrix as the first fusable op of the device aug+encode
program.

No reference counterpart: the reference's tf.data loader keeps every
stage on the host (generators.py:1766-2133), so it never has a device
link to feed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# BT.601 full-range (JPEG JFIF) coefficients
_KR, _KG, _KB = 0.299, 0.587, 0.114


def rgb_to_yuv420_np(rgb: np.ndarray):
    """RGB u8 [..., H, W, 3] -> (y [..., H, W], cb, cr [..., H/2, W/2]) u8.

    Exactly the native loader's math (fastloader.cpp rgb_to_yuv420):
    float coefficients, +0.5 round, chroma from the 2x2 box-averaged
    RGB.  H and W must be even.
    """
    rgb = np.asarray(rgb)
    f = rgb.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = np.clip(_KR * r + _KG * g + _KB * b + 0.5, 0, 255).astype(np.uint8)
    h, w = rgb.shape[-3], rgb.shape[-2]
    # 2x2 box average of RGB, then convert (linear, so equivalent to
    # averaging the per-pixel chroma)
    q = f.reshape(*f.shape[:-3], h // 2, 2, w // 2, 2, 3).mean((-2, -4))
    rq, gq, bq = q[..., 0], q[..., 1], q[..., 2]
    cb = np.clip(128.0 - 0.168736 * rq - 0.331264 * gq + 0.5 * bq + 0.5,
                 0, 255).astype(np.uint8)
    cr = np.clip(128.0 + 0.5 * rq - 0.418688 * gq - 0.081312 * bq + 0.5,
                 0, 255).astype(np.uint8)
    return y, cb, cr


def yuv420_to_rgb(y, cb, cr):
    """Planar 4:2:0 u8 -> RGB float32 in [0, 255], on device.

    ``y`` is [..., H, W]; ``cb``/``cr`` are [..., H/2, W/2].  Chroma is
    upsampled bilinear: measured against the native RGB decode of the
    same JPEG, the full round trip then errs LESS than re-saving the
    file at quality 92 (mean |dRGB| 3.5 vs 4.0, luma mean 0.19 — the
    transport is cheaper than one JPEG generation loss).  Returns
    [..., H, W, 3] float32 — the dtype the augmentation chain runs in,
    so the conversion fuses into the device stage for free.
    """
    import jax

    yf = y.astype(jnp.float32)
    cbf = cb.astype(jnp.float32) - 128.0
    crf = cr.astype(jnp.float32) - 128.0
    up_shape = (*yf.shape[:-2], yf.shape[-2], yf.shape[-1])
    cbf = jax.image.resize(cbf, up_shape, 'bilinear')
    crf = jax.image.resize(crf, up_shape, 'bilinear')
    r = yf + 1.402 * crf
    g = yf - (_KB / _KG) * 1.772 * cbf - (_KR / _KG) * 1.402 * crf
    b = yf + 1.772 * cbf
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)
