"""Pallas TPU kernel: fused greedy NMS sweep with on-the-fly overlap rows.

The greedy NMS sweep is the one inherently sequential op in the inference
pipeline (K dependent iterations).  Expressed as a plain ``lax.fori_loop``
over an HBM-resident overlap matrix, each iteration pays an HBM round-trip
for one row; this kernel instead keeps the K box components and the keep
flags VMEM-resident and computes each candidate's overlap row *inside* the
sweep (same total FLOPs as precomputing the K x K matrix — every row is
read exactly once — but O(K) VMEM instead of O(K^2), so K scales to the
full prediction count instead of OOMing the compiler at K >= 2048).

Matches ``ops.nms._greedy_sweep`` + ``_overlap_matrix`` semantics exactly
(standard IoU / DIoU, optional IoL denominators, inclusive suppression at
``overlap >= threshold`` — reference behavior from
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
_LANE = 128


def _nms_sweep_kernel(thr_ref, comps_ref, valid_ref, keep_ref, *, k: int,
                      method: str, use_iol: bool):
    xs = comps_ref[0:1, :]                    # [1, K] lane-major components
    ys = comps_ref[1:2, :]
    ws = comps_ref[2:3, :]
    hs = comps_ref[3:4, :]
    threshold = thr_ref[0]                    # SMEM scalar (may be traced)
    keep_ref[:] = valid_ref[:]                # [1, K] float 0/1
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    areas = ws * hs

    def body(i, _):
        # dynamic lane-scalar loads aren't expressible on the VPU, so box
        # i's components and keep flag are extracted with masked maxes
        m = col == i
        xi = jnp.max(jnp.where(m, xs, NEG))
        yi = jnp.max(jnp.where(m, ys, NEG))
        wi = jnp.max(jnp.where(m, ws, NEG))
        hi = jnp.max(jnp.where(m, hs, NEG))
        keep = keep_ref[:]
        keep_i = jnp.max(jnp.where(m, keep, 0.0))

        # overlap row of box i vs all candidates (VPU elementwise)
        iw = jnp.maximum(0.0, jnp.minimum(xi + wi, xs + ws)
                         - jnp.maximum(xi, xs))
        ih = jnp.maximum(0.0, jnp.minimum(yi + hi, ys + hs)
                         - jnp.maximum(yi, ys))
        inter = iw * ih
        area_i = wi * hi
        if use_iol:
            row = inter / (jnp.maximum(area_i, areas) + 1e-8)
        else:
            row = inter / (area_i + areas - inter + 1e-8)
        if method == 'diou':
            cdist = ((xi + wi / 2.0 - xs - ws / 2.0) ** 2
                     + (yi + hi / 2.0 - ys - hs / 2.0) ** 2)
            ex = jnp.maximum(xi + wi, xs + ws) - jnp.minimum(xi, xs)
            ey = jnp.maximum(yi + hi, ys + hs) - jnp.minimum(yi, ys)
            row = row - cdist / (ex * ex + ey * ey + 1e-8)

        suppress = (row >= threshold) & (keep_i > 0.5) & (col > i)
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
    kp = max(_LANE, -(-k // _LANE) * _LANE)   # pad lanes to a 128 multiple
    comps = jnp.zeros((8, kp), jnp.float32)
    comps = comps.at[0:4, :k].set(boxes.astype(jnp.float32).T)
    valid_f = jnp.zeros((1, kp), jnp.float32)
    valid_f = valid_f.at[:, :k].set(valid.astype(jnp.float32)[None, :])
    keep = pl.pallas_call(
        functools.partial(_nms_sweep_kernel, k=kp, method=method,
                          use_iol=use_iol),
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(threshold, jnp.float32).reshape(1), comps, valid_f)
    return keep[0, :k] > 0.5
