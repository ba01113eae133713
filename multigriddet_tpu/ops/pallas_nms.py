"""Pallas TPU kernel: fused pairwise-overlap + greedy NMS sweep.

The greedy NMS sweep is the one inherently sequential op in the inference
pipeline (K dependent iterations).  Expressed as a plain ``lax.fori_loop``
over an HBM-resident overlap matrix, each iteration pays an HBM round-trip
for one row; this kernel instead materializes the K x K overlap matrix in
VMEM once and runs the whole sweep on-chip: one HBM read of the K x 4
boxes, one HBM write of the K keep flags.

Matches ``ops.nms._greedy_sweep`` + ``_overlap_matrix`` semantics exactly
(standard IoU / DIoU, optional IoL denominators — reference behavior from
/root/reference/multigriddet/postprocess/nms.py:83-240).  Boxes are
top-left (x, y, w, h), already sorted by descending score; ``valid`` marks
live candidates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _overlap_block(boxes, method: str, use_iol: bool):
    """[K,4] -> [K,K] overlap matrix (VPU elementwise, fully in VMEM)."""
    x = boxes[:, 0]
    y = boxes[:, 1]
    w = boxes[:, 2]
    h = boxes[:, 3]
    x1a, x1b = x[:, None], x[None, :]
    y1a, y1b = y[:, None], y[None, :]
    wa, wb = w[:, None], w[None, :]
    ha, hb = h[:, None], h[None, :]
    iw = jnp.maximum(0.0, jnp.minimum(x1a + wa, x1b + wb)
                     - jnp.maximum(x1a, x1b))
    ih = jnp.maximum(0.0, jnp.minimum(y1a + ha, y1b + hb)
                     - jnp.maximum(y1a, y1b))
    inter = iw * ih
    aa, ab = wa * ha, wb * hb
    if use_iol:
        ov = inter / (jnp.maximum(aa, ab) + 1e-8)
    else:
        ov = inter / (aa + ab - inter + 1e-8)
    if method == 'diou':
        cxa, cxb = x1a + wa / 2.0, x1b + wb / 2.0
        cya, cyb = y1a + ha / 2.0, y1b + hb / 2.0
        cdist = (cxa - cxb) ** 2 + (cya - cyb) ** 2
        ex1 = jnp.minimum(x1a, x1b)
        ey1 = jnp.minimum(y1a, y1b)
        ex2 = jnp.maximum(x1a + wa, x1b + wb)
        ey2 = jnp.maximum(y1a + ha, y1b + hb)
        diag = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
        ov = ov - cdist / (diag + 1e-8)
    return ov


def _nms_sweep_kernel(thr_ref, boxes_ref, valid_ref, keep_ref,
                      overlap_scratch, *, k: int, method: str,
                      use_iol: bool):
    boxes = boxes_ref[:]
    threshold = thr_ref[0]                    # SMEM scalar (may be traced)
    overlap_scratch[:] = _overlap_block(boxes, method, use_iol)
    keep_ref[:] = valid_ref[:]                # [1, K] float 0/1
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, _):
        # dynamic sublane reads go through the scratch ref; the keep[i]
        # scalar is extracted with a masked max (lane-dim dynamic scalar
        # loads aren't expressible on the VPU)
        row = overlap_scratch[pl.ds(i, 1), :]            # [1, K]
        keep = keep_ref[:]
        keep_i = jnp.max(jnp.where(col == i, keep, 0.0))
        suppress = (row > threshold) & (keep_i > 0.5) & (col > i)
        keep_ref[:] = jnp.where(suppress, 0.0, keep)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(
    jax.jit, static_argnames=('method', 'use_iol', 'interpret'))
def pallas_greedy_nms(boxes: jnp.ndarray, valid: jnp.ndarray,
                      threshold, method: str = 'diou',
                      use_iol: bool = True,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused greedy NMS for one image.

    Args:
      boxes: ``[K, 4]`` top-left xywh, sorted by descending score.
      valid: ``[K]`` bool.
      threshold: scalar (python float or traced) overlap threshold.
    Returns:
      ``[K]`` bool keep mask (same keep set as ``ops.nms._greedy_sweep``).
    """
    k = boxes.shape[0]
    keep = pl.pallas_call(
        functools.partial(_nms_sweep_kernel, k=k, method=method,
                          use_iol=use_iol),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(threshold, jnp.float32).reshape(1),
      boxes.astype(jnp.float32),
      valid.astype(jnp.float32).reshape(1, k))
    return keep[0] > 0.5
