"""Space-to-depth execution rewrite for the early backbone stage.

The conv-shape profile (docs/perf/conv_shapes_b32_416.txt) shows the
entire training/inference MFU gap lives in the first two convs: the stem
(3->32 @416^2, 0.03-0.08 MFU) and the first downsample (32->64 @416^2,
0.13-0.14 MFU) run an order of magnitude below the ~1.0 MFU the deeper
layers reach, because their channel counts are far below the MXU's
128-lane granularity while their spatial extent is huge.

The classic TPU remedy (used by the MLPerf ResNet submissions) is to
re-express those convs on the space-to-depth transformed tensor: pack
each 2x2 spatial block into 4x the channels, then run mathematically
IDENTICAL convolutions with rearranged (zero-padded) kernels whose
contracting dimensions are 4x wider.  This is purely an execution
strategy: parameters keep their canonical shapes (3,3,Cin,Cout), so
checkpoints, weight porting from the reference h5 files
(/root/reference/multigriddet/models/backbones/darknet.py:19-40) and all
parity fixtures are untouched.

Layout convention: ``space_to_depth`` packs channels as
``(phase_row * 2 + phase_col) * C + c`` — i.e.
``x.reshape(B, H//2, 2, W//2, 2, C).transpose(0,1,3,2,4,5)``.

Derivation for the kernel rewrites (rows; columns are identical).  With
phase tensor ``xp[i, q] = x[2i + q]``:

* stem (k=3, s=1, SAME): ``out[2i + p] = sum_d x[2i + p + d - 1] W[d]``.
  Writing ``2i + p + d - 1 = 2(i + t - 1) + q`` gives
  ``t, q = divmod(p + d - 1, 2) + (1, 0)`` — a k=3 s=1 SAME conv in
  phase space from 4*Cin phase-channels to 4*Cout phase-channels, with
  4x nominal FLOPs (zeros) but MXU-friendly shapes.
* downsample (k=3, s=2, Darknet top/left pad):
  ``out[i] = sum_d x[2i + d - 1] W[d]`` and ``t, q = divmod(d - 1, 2) +
  (1, 0)`` — a k=2 s=1 conv (top/left pad 1) from 4*Cin phase-channels
  to Cout ordinary channels, landing exactly on the downsample's output
  resolution (the depth-to-space/space-to-depth pair between the two
  rewritten convs cancels, so the whole stem stage stays in phase
  space).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = [
    'space_to_depth', 'depth_to_space',
    'stem_kernel_to_phase', 'down_kernel_to_phase',
    'phase_stem_conv', 'phase_down_conv',
]


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C), channel = (pi*b + pj)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, block * block * c)


def depth_to_space(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, pc = x.shape
    c = pc // (block * block)
    x = x.reshape(b, h, w, block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * block, w * block, c)


def stem_kernel_to_phase(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) SAME s1 kernel -> (3,3,4Cin,4Cout) phase kernel."""
    k, k2, cin, cout = w.shape
    assert k == 3 and k2 == 3, 'stem rewrite requires a 3x3 kernel'
    wp = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for pi in range(2):
        for pj in range(2):
            for di in range(3):
                for dj in range(3):
                    ti, qi = divmod(pi + di - 1, 2)
                    tj, qj = divmod(pj + dj - 1, 2)
                    ci = (qi * 2 + qj) * cin
                    co = (pi * 2 + pj) * cout
                    wp = wp.at[ti + 1, tj + 1,
                               ci:ci + cin, co:co + cout].set(w[di, dj])
    return wp


def down_kernel_to_phase(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) Darknet s2 kernel -> (2,2,4Cin,Cout) phase kernel."""
    k, k2, cin, cout = w.shape
    assert k == 3 and k2 == 3, 'downsample rewrite requires a 3x3 kernel'
    wp = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for di in range(3):
        for dj in range(3):
            ti, qi = divmod(di - 1, 2)
            tj, qj = divmod(dj - 1, 2)
            ci = (qi * 2 + qj) * cin
            wp = wp.at[ti + 1, tj + 1, ci:ci + cin, :].set(w[di, dj])
    return wp


def phase_stem_conv(x: jnp.ndarray, w: jnp.ndarray, dtype) -> jnp.ndarray:
    """Phase-space equivalent of conv(x, w, s=1, SAME): phase in/out.

    ``x`` is the space-to-depth input (B, H/2, W/2, 4*Cin); ``w`` is the
    CANONICAL (3,3,Cin,Cout) kernel.  Returns (B, H/2, W/2, 4*Cout).
    """
    wp = stem_kernel_to_phase(w)
    return lax.conv_general_dilated(
        x.astype(dtype), wp.astype(dtype), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def phase_down_conv(x: jnp.ndarray, w: jnp.ndarray, dtype) -> jnp.ndarray:
    """Phase-space equivalent of the Darknet stride-2 downsample conv.

    ``x`` is a phase tensor (B, H/2, W/2, 4*Cin); ``w`` the canonical
    (3,3,Cin,Cout) kernel.  Returns ORDINARY space (B, H/2, W/2, Cout) —
    the downsample's own output resolution.
    """
    wp = down_kernel_to_phase(w)
    x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    return lax.conv_general_dilated(
        x.astype(dtype), wp.astype(dtype), (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
