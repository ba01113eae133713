"""On-device MultiGridDet prediction decoding.

The decode contract mirrors the reference exactly
(/root/reference/multigriddet/postprocess/multigrid_decode.py:100-183):

* ``xy = tanh(0.15 t) + sigmoid(0.15 t) + cell_grid``, normalized by grid —
  the MultiGridDet grid-sensitivity-free activation with range (-1, 2).
* ``wh = anchors[argmax(anchor_logits)] * exp(twh) / input_shape`` —
  trainable anchor prediction: the anchor is a classification output.
* confidence rescoring: ``sigmoid(obj) * max(anchor_p) * max(class_p)``.

Unlike the reference (host NumPy per scale, scipy softmax), this is one pure
JAX function per scale that jits into the model's forward program, so decode
costs nothing extra in HBM round-trips.  It is the productionized form of the
capability the reference left as dead code in gpu_postprocess.py.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def xy_activation(t: jnp.ndarray) -> jnp.ndarray:
    """MultiGridDet coordinate activation: range (-1, 2), slope-1 at 0."""
    return jnp.tanh(0.15 * t) + jax.nn.sigmoid(0.15 * t)


def invert_xy_activation(y: jnp.ndarray, iters: int = 30) -> jnp.ndarray:
    """Newton inversion of ``xy_activation`` (reference
    generators.py:2635-2693).  Valid for y in the open range (-1, 2)."""
    y = jnp.clip(y, -1.0 + 1e-4, 2.0 - 1e-4)
    x = jnp.zeros_like(y)

    def body(_, x):
        s = jax.nn.sigmoid(0.15 * x)
        th = jnp.tanh(0.15 * x)
        fx = th + s - y
        dfx = 0.15 * (1.0 - th * th) + 0.15 * s * (1.0 - s)
        return x - fx / jnp.maximum(dfx, 1e-4)

    return jax.lax.fori_loop(0, iters, body, x)


def decode_scale(prediction: jnp.ndarray,
                 anchors: jnp.ndarray,
                 input_hw: Tuple[int, int],
                 rescore_confidence: bool = True,
                 use_softmax: bool = True) -> jnp.ndarray:
    """Decode one scale's raw head output to normalized boxes + scores.

    Args:
      prediction: ``[B, gh, gw, 5 + A + C]`` raw logits.
      anchors: ``[A, 2]`` anchors in canvas pixels.
      input_hw: model canvas (height, width).

    Returns:
      ``[B, gh*gw, 5 + C]``: (cx, cy, w, h) normalized to [0,1] canvas,
      rescored confidence, per-class probabilities.
    """
    b, gh, gw, _ = prediction.shape
    num_anchors = anchors.shape[0]

    raw_xy = prediction[..., 0:2]
    raw_wh = prediction[..., 2:4]
    objectness = prediction[..., 4:5]
    anchor_logits = prediction[..., 5:5 + num_anchors]
    class_logits = prediction[..., 5 + num_anchors:]

    if use_softmax:
        anchor_probs = jax.nn.softmax(anchor_logits, axis=-1)
        class_probs = jax.nn.softmax(class_logits, axis=-1)
    else:
        anchor_probs = jax.nn.sigmoid(anchor_logits)
        class_probs = jax.nn.sigmoid(class_logits)
    obj_probs = jax.nn.sigmoid(objectness)

    cols = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1)
    rows = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0)
    cell_grid = jnp.stack([cols, rows], axis=-1)          # [gh, gw, 2]

    box_xy = xy_activation(raw_xy) + cell_grid
    box_xy = box_xy / jnp.asarray([gw, gh], jnp.float32)

    anchor_idx = jnp.argmax(anchor_probs, axis=-1)
    anchor_wh = anchors[anchor_idx]                       # [B, gh, gw, 2]
    in_wh = jnp.asarray([input_hw[1], input_hw[0]], jnp.float32)
    box_wh = anchor_wh * jnp.exp(raw_wh) / in_wh

    if rescore_confidence:
        obj_probs = (obj_probs
                     * jnp.max(anchor_probs, axis=-1, keepdims=True)
                     * jnp.max(class_probs, axis=-1, keepdims=True))

    out = jnp.concatenate([box_xy, box_wh, obj_probs, class_probs], axis=-1)
    return out.reshape(b, gh * gw, -1)


def decode_scale_for_nms(prediction: jnp.ndarray,
                         anchors: jnp.ndarray,
                         input_hw: Tuple[int, int],
                         rescore_confidence: bool = True,
                         use_softmax: bool = True):
    """``decode_scale`` specialized for the fused NMS path.

    The NMS chain consumes only (box, best-class id, rescored score) —
    the ``[B, N, C]`` class-probability tensor that dominates
    ``decode_scale``'s output bytes (C=80 of 85 channels) is reduced to
    its max/argmax here WITHOUT being materialized: ``max(softmax(x)) ==
    exp(max(x) - logsumexp(x))`` and ``argmax(softmax(x)) == argmax(x)``.
    Scores match ``decode_scale`` to float rounding (reassociated
    reductions), boxes and class ids exactly.

    Returns ``(boxes [B, gh*gw, 4] cxcywh normalized, scores [B, gh*gw],
    classes [B, gh*gw] int32)``.
    """
    b, gh, gw, _ = prediction.shape
    num_anchors = anchors.shape[0]

    raw_xy = prediction[..., 0:2]
    raw_wh = prediction[..., 2:4]
    objectness = prediction[..., 4]
    anchor_logits = prediction[..., 5:5 + num_anchors]
    class_logits = prediction[..., 5 + num_anchors:]

    if use_softmax:
        anchor_max = jnp.exp(jnp.max(anchor_logits, axis=-1)
                             - jax.nn.logsumexp(anchor_logits, axis=-1))
        class_max = jnp.exp(jnp.max(class_logits, axis=-1)
                            - jax.nn.logsumexp(class_logits, axis=-1))
    else:
        anchor_max = jax.nn.sigmoid(jnp.max(anchor_logits, axis=-1))
        class_max = jax.nn.sigmoid(jnp.max(class_logits, axis=-1))
    classes = jnp.argmax(class_logits, axis=-1).astype(jnp.int32)
    scores = jax.nn.sigmoid(objectness)
    if rescore_confidence:
        scores = scores * anchor_max * class_max

    cols = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1)
    rows = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0)
    cell_grid = jnp.stack([cols, rows], axis=-1)

    box_xy = xy_activation(raw_xy) + cell_grid
    box_xy = box_xy / jnp.asarray([gw, gh], jnp.float32)
    anchor_idx = jnp.argmax(anchor_logits, axis=-1)
    anchor_wh = anchors[anchor_idx]
    in_wh = jnp.asarray([input_hw[1], input_hw[0]], jnp.float32)
    box_wh = anchor_wh * jnp.exp(raw_wh) / in_wh

    boxes = jnp.concatenate([box_xy, box_wh], axis=-1)
    return (boxes.reshape(b, gh * gw, 4), scores.reshape(b, gh * gw),
            classes.reshape(b, gh * gw))


def decode_for_nms(predictions: Sequence[jnp.ndarray],
                   anchors: Sequence[jnp.ndarray],
                   input_hw: Tuple[int, int],
                   rescore_confidence: bool = True,
                   use_softmax: bool = True):
    """All scales, concatenated: the fused path's compact decode."""
    parts = [decode_scale_for_nms(pred, jnp.asarray(anc, jnp.float32),
                                  input_hw, rescore_confidence, use_softmax)
             for pred, anc in zip(predictions, anchors)]
    return (jnp.concatenate([p[0] for p in parts], axis=1),
            jnp.concatenate([p[1] for p in parts], axis=1),
            jnp.concatenate([p[2] for p in parts], axis=1))


def decode_predictions(predictions: Sequence[jnp.ndarray],
                       anchors: Sequence[np.ndarray],
                       input_hw: Tuple[int, int],
                       rescore_confidence: bool = True,
                       use_softmax: bool = True) -> jnp.ndarray:
    """Decode and concatenate all scales: ``[B, total_cells, 5 + C]``."""
    decoded: List[jnp.ndarray] = []
    for pred, anc in zip(predictions, anchors):
        decoded.append(
            decode_scale(pred, jnp.asarray(anc, jnp.float32), input_hw,
                         rescore_confidence, use_softmax))
    return jnp.concatenate(decoded, axis=1)
