"""3x3 multi-grid target encoding — the core MultiGridDet algorithm, on device.

Re-implements the reference's 9-cell redundant target assignment
(/root/reference/multigriddet/data/generators.py:3393-3473, NumPy; and the
TF-vectorized twin at 2696-3390) as a single fixed-shape, jit/vmap-able JAX
function.  The reference triplicates this logic (NumPy loop, TF scatter, dead
OO class); here there is exactly one canonical implementation plus a tiny
NumPy oracle used only by the golden tests.

Semantics (matching the reference NumPy encoder exactly, modulo its
square-grid-only row/col scale swap which we implement axis-correctly — see
SURVEY.md §7 "Decisions"):

  for each valid GT box, in annotation order:
    pick (layer, anchor) = argmax IoL over all anchors (rounded to 3 dp);
    compute cell (i=col, j=row) of the box center and offsets tx, ty;
    tw, th = log(max(wh / anchor_wh, 1e-3));
    for ki in (-1, 0, 1):  for kj in (-1, 0, 1):      # candidate order matters
      cell (i+ki, j+kj): skip if out of bounds;
      skip if cell already occupied AND this box already holds >= 3 cells;
      else overwrite the cell with
        [tx - ki, ty - kj, tw, th, 1, onehot(anchor), onehot(class)].

The resulting xy targets live in the expanded [-1, 2) range; targets are
stored already-activated (the loss compares them against
``tanh(0.15 x) + sigmoid(0.15 x)`` of the raw prediction).

Shapes are fully static: boxes are padded to ``max_boxes`` with zero rows
(w*h == 0 marks padding).  The per-box sequential occupancy rule is expressed
as a ``lax.scan`` over the box axis with small 9-point scatters; XLA keeps
the whole thing on device, so target encoding rides the input pipeline
instead of the host CPU.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import iol_wh

# Candidate (ki, kj) order replicates the reference loop nesting
# (generators.py:3454-3457): ki-major, kj-minor.
_KI = np.repeat(np.arange(-1, 2), 3)          # [-1,-1,-1, 0,0,0, 1,1,1]
_KJ = np.tile(np.arange(-1, 2), 3)            # [-1, 0, 1,-1,0,1,-1, 0, 1]
MAX_CELLS_PER_BOX = 3  # occupied cells may be overwritten only while < 3 held


def flatten_anchors(anchors: Sequence[np.ndarray]):
    """Static per-layer anchor metadata for the vectorized matcher.

    Returns (all_anchors [TA,2] f32, layer_of [TA] i32, k_of [TA] i32).
    """
    all_anchors = np.concatenate([np.asarray(a, np.float32) for a in anchors], 0)
    layer_of = np.concatenate(
        [np.full(len(a), l, np.int32) for l, a in enumerate(anchors)])
    k_of = np.concatenate(
        [np.arange(len(a), dtype=np.int32) for a in anchors])
    return all_anchors, layer_of, k_of


def match_anchors(boxes_wh: jnp.ndarray, all_anchors: jnp.ndarray,
                  layer_of: jnp.ndarray, k_of: jnp.ndarray):
    """Best (layer, anchor) per box by IoL, vectorized.

    The reference rounds IoL to 3 decimals before the argmax
    (generators.py:2529) which affects tie-breaks; we replicate it.

    Args:
      boxes_wh: ``[..., N, 2]`` (w, h).
    Returns:
      (layer ``[..., N]`` i32, k ``[..., N]`` i32, anchor_wh ``[..., N, 2]``).
    """
    iols = jnp.round(iol_wh(boxes_wh, all_anchors) * 1000.0) / 1000.0
    gidx = jnp.argmax(iols, axis=-1)
    return layer_of[gidx], k_of[gidx], all_anchors[gidx]


def _encode_one_image(boxes: jnp.ndarray,
                      grids: Tuple[jnp.ndarray, ...],
                      all_anchors: jnp.ndarray,
                      layer_of: jnp.ndarray,
                      k_of: jnp.ndarray,
                      anchors_per_layer: Tuple[int, ...],
                      num_classes: int,
                      input_hw: Tuple[int, int],
                      multi_anchor_assign: bool = False,
                      multi_anchor_thresh: float = 0.8):
    """Scan the padded box list into the per-layer target grids.

    With ``multi_anchor_assign`` (the capability behind the reference's
    config knob — its own encoders hardcode it off, generators.py:3435 /
    2714), a box is additionally written to every OTHER layer whose best
    in-layer anchor has IoL within ``multi_anchor_thresh`` of the global
    best and IoL > 0.5 (best_fit_and_layer semantics, generators.py:
    2534-2541), using that layer's own best anchor for the wh target.
    """
    in_h, in_w = input_hw
    num_layers = len(grids)

    # Stable-partition valid boxes to the front and loop only over them:
    # the box list is padded to max_boxes x capacity expansion (x8 under
    # mosaic+mixup => 800 rows at max_boxes=100) but typically holds tens
    # of real boxes.  Padding rows never write (valid gates on_layer), so
    # reordering them is invisible in the output — and a while_loop
    # bounded by the VALID count replaces an 800-step sequential scan
    # with a data-dependent handful of iterations on the TPU.
    valid0 = ((boxes[:, 2] - boxes[:, 0])
              * (boxes[:, 3] - boxes[:, 1])) > 0.0
    perm = jnp.argsort(jnp.logical_not(valid0), stable=True)
    boxes = boxes[perm]
    n_valid = jnp.sum(valid0.astype(jnp.int32))

    xy = jnp.floor((boxes[:, 0:2] + boxes[:, 2:4]) / 2.0)  # ref uses // 2
    wh = boxes[:, 2:4] - boxes[:, 0:2]
    cls = boxes[:, 4].astype(jnp.int32)
    valid = (wh[:, 0] * wh[:, 1]) > 0.0

    sel_layer, sel_k, sel_anchor = match_anchors(
        wh, all_anchors, layer_of, k_of)
    # per-(box, layer) best anchor: index, wh, and IoL
    iols = jnp.round(iol_wh(wh, all_anchors) * 1000.0) / 1000.0  # [N, TA]
    best_iol_global = jnp.max(iols, axis=-1)                     # [N]
    per_layer_k, per_layer_wh, per_layer_iol = [], [], []
    for l in range(num_layers):
        mask = layer_of == l
        masked = jnp.where(mask[None, :], iols, -1.0)
        gidx = jnp.argmax(masked, axis=-1)
        per_layer_k.append(k_of[gidx])
        per_layer_wh.append(all_anchors[gidx])
        per_layer_iol.append(jnp.max(masked, axis=-1))

    ki = jnp.asarray(_KI, jnp.int32)
    kj = jnp.asarray(_KJ, jnp.int32)

    def body(carry):
        grids_c, t = carry
        box_xy = xy[t]
        box_layer, box_cls, box_valid = (sel_layer[t], cls[t], valid[t])

        new_grids = []
        for l in range(num_layers):
            g = grids_c[l]
            gh, gw = g.shape[0], g.shape[1]
            a_l = anchors_per_layer[l]
            feat = 5 + a_l + num_classes
            box_k = per_layer_k[l][t]
            box_twh = jnp.log(jnp.maximum(
                wh[t] / per_layer_wh[l][t], 1e-3))

            cx = box_xy[0] * (gw / in_w)
            cy = box_xy[1] * (gh / in_h)
            i = jnp.floor(cx).astype(jnp.int32)
            j = jnp.floor(cy).astype(jnp.int32)
            tx, ty = cx - i, cy - j

            ci = i + ki            # [9] candidate cols
            cj = j + kj            # [9] candidate rows
            inb = (ci >= 0) & (ci < gw) & (cj >= 0) & (cj < gh)
            on_layer = box_valid & (box_layer == l)
            if multi_anchor_assign:
                qualifies = ((per_layer_iol[l][t]
                              / jnp.maximum(best_iol_global[t], 1e-8))
                             >= multi_anchor_thresh) \
                    & (per_layer_iol[l][t] > 0.5)
                on_layer = box_valid & ((box_layer == l) | qualifies)

            occ = g[jnp.clip(cj, 0, gh - 1), jnp.clip(ci, 0, gw - 1), 4] > 0.5

            # Sequential occupancy rule over the 9 candidates (static unroll):
            # write while the box holds < MAX_CELLS_PER_BOX cells or the cell
            # is free; count only advances on actual writes.
            writes = []
            cnt = jnp.zeros((), jnp.int32)
            for c in range(9):
                w_c = inb[c] & (~occ[c] | (cnt < MAX_CELLS_PER_BOX))
                writes.append(w_c)
                cnt = cnt + w_c.astype(jnp.int32)
            write = jnp.stack(writes) & on_layer   # [9]

            off_x = tx - ki.astype(jnp.float32)
            off_y = ty - kj.astype(jnp.float32)
            vals = jnp.concatenate([
                off_x[:, None], off_y[:, None],
                jnp.broadcast_to(box_twh, (9, 2)),
                jnp.ones((9, 1), g.dtype),
                jnp.broadcast_to(
                    jax.nn.one_hot(box_k, a_l, dtype=g.dtype), (9, a_l)),
                jnp.broadcast_to(
                    jax.nn.one_hot(box_cls, num_classes, dtype=g.dtype),
                    (9, num_classes)),
            ], axis=-1).astype(g.dtype)            # [9, feat]

            # Masked scatter: OOB indices are dropped by XLA.
            sj = jnp.where(write, cj, gh)
            si = jnp.where(write, ci, gw)
            g = g.at[sj, si, :].set(vals, mode='drop', unique_indices=True)
            new_grids.append(g)
        return tuple(new_grids), t + 1

    grids_out, _ = jax.lax.while_loop(
        lambda c: c[1] < n_valid, body,
        (grids, jnp.zeros((), jnp.int32)))
    return grids_out


@functools.partial(
    jax.jit,
    static_argnames=('anchors_tuple', 'num_classes', 'input_hw',
                     'grid_shapes', 'multi_anchor_assign',
                     'multi_anchor_thresh'))
def _encode_batch_jit(boxes, anchors_tuple, num_classes, input_hw,
                      grid_shapes, multi_anchor_assign=False,
                      multi_anchor_thresh=0.8):
    anchors = [np.asarray(a, np.float32) for a in anchors_tuple]
    all_anchors_np, layer_of_np, k_of_np = flatten_anchors(anchors)
    all_anchors = jnp.asarray(all_anchors_np)
    layer_of = jnp.asarray(layer_of_np)
    k_of = jnp.asarray(k_of_np)
    anchors_per_layer = tuple(len(a) for a in anchors)

    def one(b):
        grids = tuple(
            jnp.zeros((gh, gw, 5 + anchors_per_layer[l] + num_classes),
                      jnp.float32)
            for l, (gh, gw) in enumerate(grid_shapes))
        return _encode_one_image(b, grids, all_anchors, layer_of, k_of,
                                 anchors_per_layer, num_classes, input_hw,
                                 multi_anchor_assign, multi_anchor_thresh)

    return jax.vmap(one)(boxes)


def encode_targets(boxes: jnp.ndarray,
                   anchors: Sequence[np.ndarray],
                   num_classes: int,
                   input_hw: Tuple[int, int],
                   grid_shapes: Sequence[Tuple[int, int]] | None = None,
                   multi_anchor_assign: bool = False,
                   multi_anchor_thresh: float = 0.8):
    """Encode a padded batch of GT boxes into MultiGrid y_true tensors.

    Args:
      boxes: ``[B, N, 5]`` float32 ``(x1, y1, x2, y2, class)`` in absolute
        pixels of the model canvas; zero rows are padding.
      anchors: list of per-layer ``[A_l, 2]`` anchor arrays (pixels).
      num_classes: number of classes.
      input_hw: model canvas (height, width).
      grid_shapes: optional per-layer (gh, gw); default strides 32/16/8...

    Returns:
      tuple of ``[B, gh_l, gw_l, 5 + A_l + C]`` float32 target grids.
    """
    if grid_shapes is None:
        strides = (32, 16, 8, 4, 2)
        grid_shapes = tuple(
            (input_hw[0] // strides[l], input_hw[1] // strides[l])
            for l in range(len(anchors)))
    anchors_tuple = tuple(
        tuple(map(tuple, np.asarray(a, np.float32).tolist()))
        for a in anchors)
    return _encode_batch_jit(
        jnp.asarray(boxes, jnp.float32), anchors_tuple, num_classes,
        tuple(input_hw), tuple(map(tuple, grid_shapes)),
        multi_anchor_assign, multi_anchor_thresh)


# ---------------------------------------------------------------------------
# NumPy oracle — used only by the golden tests to pin the exact semantics.
# ---------------------------------------------------------------------------

def encode_targets_np(boxes: np.ndarray,
                      anchors: Sequence[np.ndarray],
                      num_classes: int,
                      input_hw: Tuple[int, int],
                      grid_shapes: Sequence[Tuple[int, int]] | None = None):
    """Reference-semantics NumPy encoder (test oracle, host only)."""
    anchors = [np.asarray(a, np.float32) for a in anchors]
    num_layers = len(anchors)
    if grid_shapes is None:
        strides = (32, 16, 8, 4, 2)
        grid_shapes = [(input_hw[0] // strides[l], input_hw[1] // strides[l])
                       for l in range(num_layers)]
    boxes = np.asarray(boxes, np.float32)
    bsz, n = boxes.shape[0], boxes.shape[1]
    y_true = [np.zeros((bsz, gh, gw, 5 + len(anchors[l]) + num_classes),
                       np.float32)
              for l, (gh, gw) in enumerate(grid_shapes)]
    all_anchors, layer_of, k_of = flatten_anchors(anchors)
    in_h, in_w = input_hw

    for b in range(bsz):
        for t in range(n):
            x1, y1, x2, y2, c = boxes[b, t]
            w, h = x2 - x1, y2 - y1
            if w * h <= 0:
                continue
            iols = np.round(
                np.array(iol_wh(jnp.asarray([[w, h]], jnp.float32),
                                jnp.asarray(all_anchors)))[0], 3)
            g = int(np.argmax(iols))
            l, k = int(layer_of[g]), int(k_of[g])
            gh, gw = grid_shapes[l]
            cx = np.floor((x1 + x2) / 2.0) * (gw / in_w)
            cy = np.floor((y1 + y2) / 2.0) * (gh / in_h)
            i, j = int(np.floor(cx)), int(np.floor(cy))
            tx, ty = cx - i, cy - j
            tw = np.log(max(w / all_anchors[g][0], 1e-3))
            th = np.log(max(h / all_anchors[g][1], 1e-3))
            cnt = 0
            for ki in range(-1, 2):
                for kj in range(-1, 2):
                    ci, cj = i + ki, j + kj
                    if not (0 <= ci < gw and 0 <= cj < gh):
                        continue
                    if y_true[l][b, cj, ci, 4] == 1 and cnt >= MAX_CELLS_PER_BOX:
                        continue
                    y_true[l][b, cj, ci] = 0.0
                    y_true[l][b, cj, ci, 0:4] = [tx - ki, ty - kj, tw, th]
                    y_true[l][b, cj, ci, 4] = 1.0
                    y_true[l][b, cj, ci, 5 + k] = 1.0
                    y_true[l][b, cj, ci, 5 + len(anchors[l]) + int(c)] = 1.0
                    cnt += 1
    return y_true


def extract_center_gt_boxes(y_true_layer: jnp.ndarray,
                            anchors_layer: jnp.ndarray,
                            input_hw: Tuple[int, int],
                            max_boxes: int):
    """Recover up to ``max_boxes`` GT boxes from a target grid (fixed shape).

    Every GT box owns (at most) one *center* cell whose stored offsets lie in
    [0, 1).  Selecting those cells recovers the original box list without
    duplicates, giving the loss a cheap fixed-size GT set for its ignore mask
    (replaces the reference's dynamic gather + map_fn,
    multigrid_loss.py:574-652).

    Returns:
      (boxes ``[B, max_boxes, 4]`` cxcywh in absolute canvas pixels,
       mask ``[B, max_boxes]`` validity).
    """
    in_h, in_w = input_hw
    b, gh, gw, _ = y_true_layer.shape
    txy = y_true_layer[..., 0:2]
    obj = y_true_layer[..., 4]
    is_center = ((txy[..., 0] >= 0.0) & (txy[..., 0] < 1.0) &
                 (txy[..., 1] >= 0.0) & (txy[..., 1] < 1.0) & (obj > 0.5))

    cols = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    cx = (txy[..., 0] + cols) * (in_w / gw)
    cy = (txy[..., 1] + rows) * (in_h / gh)
    n_anchors = anchors_layer.shape[0]
    anchor_idx = jnp.argmax(y_true_layer[..., 5:5 + n_anchors], axis=-1)
    wh = jnp.exp(y_true_layer[..., 2:4]) * anchors_layer[anchor_idx]

    score = is_center.astype(jnp.float32).reshape(b, -1)
    k = min(max_boxes, score.shape[1])
    top, idx = jax.lax.top_k(score, k)
    flat = jnp.concatenate(
        [cx[..., None], cy[..., None], wh], axis=-1).reshape(b, -1, 4)
    boxes = jnp.take_along_axis(flat, idx[..., None], axis=1)
    if k < max_boxes:
        boxes = jnp.pad(boxes, ((0, 0), (0, max_boxes - k), (0, 0)))
        top = jnp.pad(top, ((0, 0), (0, max_boxes - k)))
    return boxes, top > 0.5
