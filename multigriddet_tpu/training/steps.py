"""Jitted, mesh-sharded train / eval / infer steps.

The reference trains through Keras ``model.fit`` with the loss as a Lambda
layer (multigriddet_darknet.py:647-726) on a single device.  Here a step is
``jit(grad(loss))`` + optax, compiled over a ``jax.sharding.Mesh`` with the
batch dimension sharded across devices (data parallelism) and parameters
replicated: XLA inserts the gradient all-reduce and turns BatchNorm's
batch-axis reductions into cross-device collectives automatically (GSPMD),
so collectives ride the ICI with no hand-written comms.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses import LossConfig, multigrid_loss
from ..ops.decode import decode_for_nms
from ..ops.nms import batched_nms
from ..ops.yuv import yuv420_to_rgb
from ..parallel import (image_partition_spec, make_mesh,  # noqa: F401
                        make_mesh_2d, replicate, shard_batch)
from .state import TrainState


def make_train_step(model, tx: optax.GradientTransformation,
                    anchors: Sequence[np.ndarray], num_classes: int,
                    input_hw: Tuple[int, int],
                    loss_cfg: LossConfig = LossConfig(),
                    class_weights: Optional[jnp.ndarray] = None,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True,
                    strides: Tuple[int, ...] = (32, 16, 8),
                    freeze_level: int = 0,
                    ema_decay: Optional[float] = None) -> Callable:
    """Build the jitted train step: (state, images, y_true) -> (state, metrics).

    With ``mesh``, inputs are expected batch-sharded and state replicated;
    the returned function carries explicit sharding constraints so it can be
    called directly on host arrays too.

    ``freeze_level`` mirrors the reference's Keras ``trainable=False``
    semantics (multigriddet_darknet.py:634-645), where freezing a layer also
    puts its BatchNorm in inference mode (moving stats used for
    normalization, never updated): 1 freezes the backbone's BN alongside
    its params; >=2 freezes every BN (only the BN-free predict convs
    train).  The optimizer ``tx`` must be partitioned to match
    (state.partition_optimizer).

    ``ema_decay`` (beyond-reference): when set and ``state.ema_params``
    is a tree, each step also updates
    ``ema' = d * ema + (1 - d) * params`` inside the same XLA program.
    """
    core = _build_train_core(model, tx, anchors, num_classes, loss_cfg,
                             class_weights, mesh, strides, freeze_level,
                             ema_decay)
    donate_argnums = (0,) if donate else ()
    return jax.jit(core, donate_argnums=donate_argnums)


def _build_train_core(model, tx, anchors, num_classes,
                      loss_cfg=LossConfig(), class_weights=None, mesh=None,
                      strides=(32, 16, 8), freeze_level=0, ema_decay=None):
    """Un-jitted (state, images, y_true) -> (state, metrics) train body,
    shared by :func:`make_train_step` and :func:`make_fused_train_step`."""
    anchors = [np.asarray(a, np.float32) for a in anchors]

    def loss_fn(params, batch_stats, images, y_true):
        if freeze_level >= 2:
            # only the predict convs train: whole model in inference mode,
            # no BN statistics update (reference freezes all but the last
            # 3 layers)
            outs = model.apply(
                {'params': params, 'batch_stats': batch_stats}, images,
                train=False)
            new_bs = batch_stats
        elif freeze_level == 1:
            # frozen backbone runs eval-mode BN; head/neck BN still trains
            outs, mut = model.apply(
                {'params': params, 'batch_stats': batch_stats}, images,
                train=True, backbone_train=False, mutable=['batch_stats'])
            new_bs = mut['batch_stats']
        else:
            outs, mut = model.apply(
                {'params': params, 'batch_stats': batch_stats}, images,
                train=True, mutable=['batch_stats'])
            new_bs = mut['batch_stats']
        total, metrics = multigrid_loss(
            outs, list(y_true), anchors, num_classes,
            tuple(images.shape[1:3]), loss_cfg,
            class_weights, strides=strides)
        return total, (new_bs, metrics)

    def step(state: TrainState, images, y_true):
        if mesh is not None:
            images = jax.lax.with_sharding_constraint(
                images, NamedSharding(mesh, image_partition_spec(mesh)))
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, images, y_true)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            d = jnp.asarray(ema_decay, jnp.float32)
            new_ema = jax.tree.map(
                lambda e, p: (e * d + p.astype(e.dtype) * (1.0 - d)),
                state.ema_params, new_params)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, ema_params=new_ema)
        metrics = dict(metrics)
        metrics['loss'] = loss
        return new_state, metrics

    return step


def make_fused_train_step(model, tx: optax.GradientTransformation,
                          anchors: Sequence[np.ndarray], num_classes: int,
                          loss_cfg: LossConfig = LossConfig(),
                          aug_cfg: Optional[dict] = None,
                          class_weights: Optional[jnp.ndarray] = None,
                          mesh: Optional[Mesh] = None,
                          donate: bool = True,
                          strides: Tuple[int, ...] = (32, 16, 8),
                          freeze_level: int = 0,
                          ema_decay: Optional[float] = None,
                          multi_anchor_assign: bool = False,
                          train_aug: bool = True):
    """Fully fused training step: input stage + model update, ONE program.

    The generator path runs TWO jitted programs per batch — the device
    aug+encode stage (data/pipeline._device_stage) and the train step —
    serialized through an intermediate f32 image + y_true round-trip in
    HBM and a second host dispatch.  This builder fuses them: a single
    XLA program takes the raw uint8 batch (or an HBM image-bank gather),
    runs augmentation + 9-cell target encoding + forward + MultiGridLoss
    + backward + optimizer update, letting XLA fuse the normalize into
    the first conv and delete the intermediate y_true materialization.
    Replaces the reference's host-side generator + model.fit split
    (generators.py:1766-2133 feeding multigriddet_darknet.py:647-726).

    Returns ``(host_step, bank_step)``:
      host_step(state, parts, boxes [B,N,5], key)
      bank_step(state, banks, idx [B] i32, boxes, key)
    ``parts``/``banks`` are the generator's link-format pixel tuples
    (1-tuple u8 RGB [B,H,W,3] / [R,H,W,3], or 3-tuple planar YCbCr
    4:2:0 — data/pipeline.iter_raw); a bare array is accepted for the
    rgb case.  Both return ``(new_state, metrics)``.  The canvas (h, w)
    is read from the pixel shapes, so multi-scale buckets compile one
    program each under the same callable.
    """
    from ..data.pipeline import _device_stage, _freeze
    anchors_np = [np.asarray(a, np.float32) for a in anchors]
    anchors_tuple = tuple(tuple(map(tuple, a.tolist())) for a in anchors_np)
    frozen_aug = _freeze(dict(aug_cfg or {}))
    core = _build_train_core(model, tx, anchors_np, num_classes, loss_cfg,
                             class_weights, mesh, strides, freeze_level,
                             ema_decay)

    def _stage_and_step(state, parts, boxes, key):
        hw = tuple(int(s) for s in parts[0].shape[1:3])
        images, y_true, _ = _device_stage(
            parts, boxes, key, frozen_aug, anchors_tuple, num_classes,
            hw, train_aug, multi_anchor_assign)
        return core(state, images, y_true)

    def host_step(state, parts, boxes, key):
        if not isinstance(parts, (tuple, list)):
            parts = (parts,)
        if mesh is not None:
            # P('batch','space') matches every part: dim 0 batch, dim 1
            # canvas rows (H for rgb/y, H/2 for the chroma planes)
            spec = image_partition_spec(mesh)
            parts = tuple(jax.lax.with_sharding_constraint(
                p, NamedSharding(mesh, spec)) for p in parts)
            boxes = jax.lax.with_sharding_constraint(
                boxes, NamedSharding(mesh, P('batch')))
        return _stage_and_step(state, parts, boxes, key)

    def bank_step(state, banks, idx, boxes, key):
        if not isinstance(banks, (tuple, list)):
            banks = (banks,)
        if mesh is not None:
            boxes = jax.lax.with_sharding_constraint(
                boxes, NamedSharding(mesh, P('batch')))
        parts = tuple(b[idx] for b in banks)
        if mesh is not None:
            spec = image_partition_spec(mesh)
            parts = tuple(jax.lax.with_sharding_constraint(
                p, NamedSharding(mesh, spec)) for p in parts)
        return _stage_and_step(state, parts, boxes, key)

    donate_argnums = (0,) if donate else ()
    return (jax.jit(host_step, donate_argnums=donate_argnums),
            jax.jit(bank_step, donate_argnums=donate_argnums))


def make_eval_step(model, anchors: Sequence[np.ndarray], num_classes: int,
                   input_hw: Tuple[int, int],
                   loss_cfg: LossConfig = LossConfig(),
                   class_weights: Optional[jnp.ndarray] = None,
                   mesh: Optional[Mesh] = None,
                   strides: Tuple[int, ...] = (32, 16, 8)) -> Callable:
    """Validation step: forward (frozen BN stats) + loss metrics."""
    anchors = [np.asarray(a, np.float32) for a in anchors]

    def step(state: TrainState, images, y_true):
        if mesh is not None:
            images = jax.lax.with_sharding_constraint(
                images, NamedSharding(mesh, image_partition_spec(mesh)))
        outs = model.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            images, train=False)
        total, metrics = multigrid_loss(
            outs, list(y_true), anchors, num_classes, input_hw, loss_cfg,
            class_weights, strides=strides)
        metrics = dict(metrics)
        metrics['loss'] = total
        return metrics

    return jax.jit(step)


def make_infer_step(model, anchors: Sequence[np.ndarray],
                    input_hw: Tuple[int, int],
                    confidence: float = 0.1,
                    nms_threshold: float = 0.45,
                    nms_method: str = 'diou',
                    use_iol: bool = True,
                    max_boxes: int = 100,
                    pre_nms_top_k: int = 1024,
                    class_aware: bool = False,
                    nms_backend: str = 'xla',
                    use_wbf: bool = False,
                    pack_outputs: bool = False,
                    link_format: str = 'rgb',
                    mesh: Optional[Mesh] = None) -> Callable:
    """Fused forward + decode + NMS, entirely on device.

    With ``link_format='yuv420'`` the step takes planar YCbCr 4:2:0
    uint8 planes — ``step(variables, y, cb, cr)`` with y [B,H,W] and
    cb/cr [B,H/2,W/2] — and inverts the transport on device as the
    first fusable op (ops/yuv.py).  Half the host->device bytes of RGB
    per batch; on a tunneled/bandwidth-limited link the serving loop is
    transfer-bound, so this is ~2x eval/serving throughput there.

    This productionizes the capability the reference left dead in
    gpu_postprocess.py: one XLA program from pixels to final (boxes,
    classes, scores, valid) — no host round-trip between model and NMS.
    Boxes come back as top-left (x, y, w, h) in canvas pixels.

    With ``use_wbf=True`` the NMS sweep is skipped and the step returns
    the ``pre_nms_top_k`` confidence-filtered candidates (score-sorted)
    instead, for host-side Weighted Boxes Fusion — the reference's
    ``detection.use_wbf`` mode (inference_engine.py:126-135, WBF replaces
    NMS in handle_predictions, multigrid_decode.py:262-320).

    With ``pack_outputs=True`` the four outputs come back as ONE
    ``[B, 7, K]`` float32 array ``[x, y, w, h, class, score, valid]``
    stacked on the second-minor axis (K rides the 128-lane minor dim;
    ``unpack_detections`` inverts it on host).  One device->host fetch
    instead of four — on a tunneled device each fetch pays a full RTT,
    which dominates small-batch/video serving latency.
    """
    anchors = [np.asarray(a, np.float32) for a in anchors]
    scale = jnp.asarray([input_hw[1], input_hw[0],
                         input_hw[1], input_hw[0]], jnp.float32)

    if link_format not in ('rgb', 'yuv420'):
        raise ValueError(f'unknown link_format {link_format!r}')

    def _forward_chain(variables, images):
        outs = model.apply(variables, images, train=False)
        # compact decode: max/argmax over class channels WITHOUT
        # materializing the [B, N, C] probability tensor (C=80 of the 85
        # output channels — pure HBM traffic the NMS chain never reads)
        boxes, scores, classes = decode_for_nms(outs, anchors, input_hw)
        xy, wh = boxes[..., 0:2], boxes[..., 2:4]
        tl = jnp.concatenate([xy - wh / 2.0, wh], axis=-1) * scale
        if use_wbf:
            def candidates(bx, sc, cl):
                sc = jnp.where(sc >= confidence, sc, -1e9)
                k = min(pre_nms_top_k, sc.shape[0])
                top_sc, idx = jax.lax.top_k(sc, k)
                return bx[idx], cl[idx], top_sc, top_sc > -1e8
            res = jax.vmap(candidates)(tl, scores, classes)
        else:
            res = batched_nms(
                tl, scores, classes, confidence, nms_threshold,
                max_boxes=max_boxes, pre_nms_top_k=pre_nms_top_k,
                nms_method=nms_method, use_iol=use_iol,
                class_aware=class_aware, backend=nms_backend)
        if pack_outputs:
            b, c, s, v = res
            # packed layout is [B, 7, K], K on the minor dim: f32 tiles
            # are (8, 128) on TPU, so a [B, K, 7] layout pads the minor
            # 7 up to 128 and inflates the packed HBM write ~18x
            # (measured ~7% of end-to-end serving throughput at b128,
            # tools/profile_engine_gap.py)
            return jnp.concatenate(
                [jnp.moveaxis(b, -1, -2),
                 c[..., None, :].astype(jnp.float32),
                 s[..., None, :].astype(jnp.float32),
                 v[..., None, :].astype(jnp.float32)], axis=-2)
        return res

    def step(variables, images):
        if mesh is not None:
            images = jax.lax.with_sharding_constraint(
                images, NamedSharding(mesh, image_partition_spec(mesh)))
        if images.dtype == jnp.uint8:
            # ship uint8 over the host link (4x less traffic than f32)
            # and normalize on device
            images = images.astype(jnp.float32) / 255.0
        return _forward_chain(variables, images)

    def step_yuv(variables, y, cb, cr):
        images = yuv420_to_rgb(y, cb, cr) / 255.0
        if mesh is not None:
            images = jax.lax.with_sharding_constraint(
                images, NamedSharding(mesh, image_partition_spec(mesh)))
        return _forward_chain(variables, images)

    return jax.jit(step_yuv if link_format == 'yuv420' else step)


def unpack_detections(packed: np.ndarray):
    """Invert ``make_infer_step(pack_outputs=True)`` on host.

    Takes the packed ``[..., 7, K]`` array; returns
    (boxes [..., K, 4] f32, classes [..., K] i32,
    scores [..., K] f32, valid [..., K] bool)."""
    packed = np.asarray(packed)
    return (np.moveaxis(packed[..., 0:4, :], -2, -1),
            packed[..., 4, :].astype(np.int32),
            packed[..., 5, :], packed[..., 6, :] > 0.5)


def fetch_detections(outs):
    """One host fetch of an infer-step result, packed or tuple.

    Accepts the raw 4-tuple (boxes, classes, scores, valid) from
    ``make_infer_step(pack_outputs=False)`` — the serving default: the
    packed concat costs ~6% of the whole fused program at b128 while
    four batched ``device_get`` transfers are cheaper than one packed
    fetch (measured 1455 vs 1402 img/s forced-per-batch,
    tools/profile_engine_gap.py) — or the packed ``[..., 7, K]`` array.
    Returns np (boxes [..., K, 4] f32, classes i32, scores f32,
    valid bool)."""
    if isinstance(outs, (tuple, list)):
        b, c, s, v = jax.device_get(tuple(outs))
        return (np.asarray(b), np.asarray(c, np.int32),
                np.asarray(s), np.asarray(v, bool))
    return unpack_detections(outs)
