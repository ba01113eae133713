"""Config -> model / loss / optimizer factories.

TPU-native counterpart of the reference model_builder
(/root/reference/multigriddet/config/model_builder.py:22-299): extracts the
~20 loss-scale knobs from ``training.loss``, loss normalization, auto/manual
class weights, and builds the flax model + LossConfig + optax optimizer.
Learning-rate priority matches the reference: ``training.learning_rate`` >
``optimizer.learning_rate`` > 1e-3 (model_builder.py:44-54).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np
import optax

from ..losses import LossConfig
from ..models import create_model
from ..utils.anchors import (class_counts_from_annotations,
                             compute_class_weights, load_anchors,
                             load_classes)


def model_spec_from_config(config: Dict[str, Any]) -> Dict[str, Any]:
    """Resolve the model preset block into constructor arguments."""
    model_cfg = config.get('model', {}) or {}
    preset = model_cfg.get('preset', {}) or {}
    if model_cfg and not preset and model_cfg.get('type', 'preset') == 'preset':
        print("WARNING: config has a 'model' block but no 'model.preset' "
              "section — falling back to defaults (multigriddet_darknet, "
              "COCO anchors). Nest architecture/num_classes/input_shape/"
              "anchors_path/classes_path under 'model.preset' "
              "(see configs/models/multigriddet_darknet.yaml).")
    arch = preset.get('architecture', 'multigriddet_darknet')
    input_shape = tuple(preset.get('input_shape', (608, 608, 3)))
    num_classes = preset.get('num_classes')
    classes_path = preset.get('classes_path') or (
        config.get('data', {}) or {}).get('classes_path')
    class_names: Optional[List[str]] = None
    if classes_path:
        try:
            class_names = load_classes(classes_path)
        except OSError:
            class_names = None
    if num_classes is None:
        num_classes = len(class_names) if class_names else 80
    anchors = load_anchors(preset.get('anchors_path'))
    return {
        'architecture': arch,
        'input_shape': input_shape,
        'num_classes': int(num_classes),
        'class_names': class_names,
        'anchors': anchors,
        'custom': model_cfg.get('custom'),
        'mode': model_cfg.get('type', 'preset'),
    }


def resolve_compute_dtype(config: Dict[str, Any],
                          default_mixed: bool = False):
    """Compute dtype from ``environment.mixed_precision``.

    The reference's evaluator honors this knob via the Keras mixed-
    precision policy (reference evaluation/evaluator.py:50-54, policy
    setter utils/tf_optimization.py:349-356); here it selects the flax
    compute dtype (params always stay float32 — models/layers.py).

    Serving paths (inference/eval) pass ``default_mixed=True``: bfloat16
    conv compute rides the MXU at ~2x float32 throughput, while the
    predict convs emit float32 logits (models/layers.py PredictConv) and
    decode/NMS run in float32, so detections match the float32 model
    within tolerance (tests/test_inference.py::test_bf16_f32_parity).
    Set ``environment.mixed_precision: false`` to force float32.
    """
    env = config.get('environment', {}) or {}
    mixed = env.get('mixed_precision')
    if mixed is None:
        mixed = default_mixed
    return jnp.bfloat16 if mixed else jnp.float32


def build_model_from_config(config: Dict[str, Any], dtype=jnp.float32,
                            bn_axis_name: Optional[str] = None):
    """Instantiate the flax detector from a loaded config.

    Returns (model, spec) where spec carries input shape / classes / anchors.
    """
    spec = model_spec_from_config(config)
    num_anchors = tuple(len(a) for a in spec['anchors'])
    bn_momentum = float(
        (config.get('model', {}) or {}).get('preset', {}).get(
            'bn_momentum',
            (config.get('training', {}) or {}).get('bn_momentum', 0.99)))
    if spec['mode'] == 'custom' and spec['custom']:
        from ..models import build_custom
        custom = spec['custom']
        neck_cfg = dict(custom.get('neck', {}) or {})
        neck_type = neck_cfg.pop('type', None)
        if 'channels' in neck_cfg:
            neck_cfg['channels'] = tuple(neck_cfg['channels'])
        model = build_custom(
            (custom.get('backbone', {}) or {}).get('type', 'darknet53'),
            (custom.get('head', {}) or {}).get('type', 'multigrid'),
            neck_name=neck_type, neck_kwargs=neck_cfg,
            num_anchors=num_anchors, num_classes=spec['num_classes'],
            dtype=dtype, bn_axis_name=bn_axis_name)
    else:
        # False | True/'conv' (selective: keep conv outputs) | 'full'
        remat = (config.get('environment', {}) or {}).get('remat', False)
        # space-to-depth early-stage rewrite: on by default for the
        # backbones that support it; `model.s2d_stem: false` disables
        s2d_stem = (config.get('model', {}) or {}).get('s2d_stem')
        model = create_model(
            spec['architecture'], num_anchors=num_anchors,
            num_classes=spec['num_classes'], dtype=dtype,
            bn_axis_name=bn_axis_name, bn_momentum=bn_momentum,
            remat=remat, s2d_stem=s2d_stem)
    return model, spec


def _init_variables(model, spec):
    import jax

    dummy = jnp.zeros((1, *spec['input_shape'][:2], 3), jnp.float32)
    return dict(jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), dummy, train=False))())


def build_model_for_inference(config: Dict[str, Any],
                              weights_path: Optional[str] = None):
    """Build the detector and load inference weights
    (reference model_builder.py:277-299).

    Returns ``(model, variables, spec)`` — ``variables`` holds
    params + batch_stats ready for ``model.apply`` or
    ``training.make_infer_step``.  ``weights_path`` falls back to the
    config's ``weights_path`` key; a missing file warns (reference
    behavior) and leaves the random init.  Compute dtype follows
    ``environment.mixed_precision`` (bfloat16 by default for serving;
    see :func:`resolve_compute_dtype`).
    """
    import os

    model, spec = build_model_from_config(
        config, dtype=resolve_compute_dtype(config, default_mixed=True))
    variables = _init_variables(model, spec)
    if weights_path is None:
        weights_path = config.get('weights_path')
    if weights_path and os.path.exists(weights_path):
        from ..training.checkpoint import load_weights_flexible
        params, batch_stats = load_weights_flexible(
            weights_path, variables['params'],
            variables.get('batch_stats', {}))
        variables = {'params': params, 'batch_stats': batch_stats}
        print(f'Loaded weights from: {weights_path}')
    elif weights_path:
        print(f'WARNING: weights file not found: {weights_path}')
    else:
        print('WARNING: no weights path specified')
    return model, variables, spec


def build_model_for_training(config: Dict[str, Any],
                             weights_path: Optional[str] = None,
                             backbone_weights_path: Optional[str] = None):
    """Build the detector with training weights + loss config
    (reference model_builder.py:260-275).

    Returns ``(model, variables, spec, loss_cfg)``.  The reference
    returns a Keras model with the loss compiled in; here the loss is
    a pure function, so the bundle carries the :class:`LossConfig` to
    pass to ``training.make_train_step`` (or use
    :class:`training.MultiGridTrainer`, which drives the full loop).
    ``backbone_weights_path`` loads only the backbone subtree
    (transfer learning), mirroring the trainer's
    ``resume.backbone_weights_path``.
    """
    import os

    model, spec = build_model_from_config(config)
    variables = _init_variables(model, spec)
    if weights_path is None:
        weights_path = (config.get('resume', {}) or {}).get('weights_path')
    if backbone_weights_path is None:
        backbone_weights_path = (config.get('resume', {}) or {}).get(
            'backbone_weights_path')
    if weights_path and os.path.exists(weights_path):
        from ..training.checkpoint import load_weights_flexible
        params, batch_stats = load_weights_flexible(
            weights_path, variables['params'],
            variables.get('batch_stats', {}))
        variables = {'params': params, 'batch_stats': batch_stats}
        print(f'Loaded full weights from: {weights_path}')
    elif backbone_weights_path and os.path.exists(backbone_weights_path):
        from ..training.checkpoint import load_backbone_flexible
        backbone, bb_stats = load_backbone_flexible(
            backbone_weights_path, variables['params']['backbone'],
            (variables.get('batch_stats') or {}).get('backbone'))
        variables['params'] = dict(variables['params'], backbone=backbone)
        if bb_stats is not None and variables.get('batch_stats'):
            variables['batch_stats'] = dict(variables['batch_stats'],
                                            backbone=bb_stats)
        print(f'Loaded backbone weights from: {backbone_weights_path}')
    elif weights_path or backbone_weights_path:
        print(f'WARNING: weights file not found: '
              f'{weights_path or backbone_weights_path}')
    return model, variables, spec, loss_config_from_config(config)


def loss_config_from_config(config: Dict[str, Any]) -> LossConfig:
    """Extract LossConfig from the ``training`` block
    (reference model_builder.py:126-151)."""
    training = config.get('training', {}) or {}
    loss = training.get('loss', {}) or {}
    # ignore-mask GT capacity: defaults to the pipeline's post-expansion box
    # capacity (max_boxes_per_image x mosaic/mixup factor) so crowded batches
    # never silently weaken the ignore mask (the reference handles all GTs
    # dynamically, multigrid_loss.py:574-652)
    aug = training.get('augmentation', {}) or {}
    max_gt = loss.get('max_gt_boxes')
    if max_gt is None:
        from ..data.pipeline import calculate_expansion_factor
        factor = calculate_expansion_factor(
            float(aug.get('mosaic_prob', 0.0) or 0.0),
            float(aug.get('mixup_prob', 0.0) or 0.0))
        max_gt = int(aug.get('max_boxes_per_image', 100)) * factor
        # copy-paste adds +copypaste_max slots on top of the multiplicative
        # expansion (pipeline.py:104-112); mirror that here so pasted GTs
        # can't overflow the ignore-mask capacity in fully-crowded images
        if float(aug.get('copypaste_prob', 0.0) or 0.0) > 0:
            max_gt += int(aug.get('copypaste_max', 4))
    norm = training.get('loss_normalization', ['batch'])
    if isinstance(norm, str):
        norm = [norm]
    iou_type = 'giou'
    for key, kind in (('use_giou_loss', 'giou'), ('use_diou_loss', 'diou'),
                      ('use_ciou_loss', 'ciou')):
        if loss.get(key):
            iou_type = kind
    return LossConfig(
        loss_option=int(training.get('loss_option', 2)),
        ignore_thresh=float(loss.get('ignore_thresh', 0.5)),
        coord_scale=float(loss.get('coord_scale', 1.0)),
        object_scale=float(loss.get('object_scale', 1.0)),
        no_object_scale=float(loss.get('no_object_scale', 1.0)),
        class_scale=float(loss.get('class_scale', 1.0)),
        anchor_scale=float(loss.get('anchor_scale', 1.0)),
        label_smoothing=float(training.get('label_smoothing', 0.0)),
        use_focal_loss=bool(loss.get('use_focal_loss', False)),
        use_softmax_loss=bool(loss.get('use_softmax_loss', False)),
        iou_loss_type=iou_type,
        use_iou_aware_objectness=bool(
            loss.get('use_iou_aware_objectness', False)),
        iou_objectness_power=float(loss.get('iou_objectness_power', 1.5)),
        iou_objectness_ratio=float(loss.get('iou_objectness_ratio', 1.0)),
        trainable_nms_weight=float(loss.get('trainable_nms_weight', 0.0)),
        trainable_nms_power=float(loss.get('trainable_nms_power', 2.0)),
        use_consensus_loss=bool(loss.get('use_consensus_loss', False)),
        consensus_kernel_size=int(loss.get('consensus_kernel_size', 3)),
        consensus_iou_power=float(loss.get('consensus_iou_power', 1.5)),
        consensus_min_iou=float(loss.get('consensus_min_iou', 1e-3)),
        consensus_coord_scale=float(loss.get('consensus_coord_scale', 0.5)),
        consensus_obj_scale=float(loss.get('consensus_obj_scale', 0.5)),
        consensus_class_scale=float(loss.get('consensus_class_scale', 0.3)),
        consensus_stop_gradient=bool(
            loss.get('consensus_stop_gradient', True)),
        consensus_center_tolerance=float(
            loss.get('consensus_center_tolerance', 1e-4)),
        loss_normalization=tuple(norm),
        max_gt_boxes=int(max_gt),
    )


def class_weights_from_config(config: Dict[str, Any], num_classes: int,
                              annotation_lines=None
                              ) -> Optional[np.ndarray]:
    """'auto' / explicit list / None class weights
    (reference model_builder.py:154-178)."""
    training = config.get('training', {}) or {}
    cw = training.get('class_weights')
    if cw is None:
        return None
    if cw == 'auto':
        if not annotation_lines:
            return None
        counts = class_counts_from_annotations(annotation_lines, num_classes)
        method = training.get('class_weights_method', 'balanced')
        return compute_class_weights(counts, method)
    arr = np.asarray(cw, np.float32)
    if arr.shape != (num_classes,):
        raise ValueError(
            f'class_weights length {arr.shape} != num_classes {num_classes}')
    return arr


def resolve_learning_rate(config: Dict[str, Any]) -> float:
    training = config.get('training', {}) or {}
    optimizer = config.get('optimizer', {}) or {}
    if training.get('learning_rate') is not None:
        return float(training['learning_rate'])
    if optimizer.get('learning_rate') is not None:
        return float(optimizer['learning_rate'])
    return 1e-3


def make_lr_schedule(config: Dict[str, Any], steps_per_epoch: int,
                     total_epochs: int):
    """Cosine-annealing-with-warmup or constant schedule.

    The reference's CosineAnnealingWithWarmup callback
    (trainers/trainer.py:23-100) works per-epoch; here it is a per-step
    optax schedule.  reduce_on_plateau is handled at the optimizer level by
    the trainer (it needs the validation signal).
    """
    base_lr = resolve_learning_rate(config)
    sched_cfg = config.get('lr_schedule', {}) or {}
    kind = sched_cfg.get('type', 'constant')
    if kind == 'cosine_annealing':
        warmup_epochs = int(sched_cfg.get('warmup_epochs', 0))
        warmup_factor = float(sched_cfg.get('warmup_lr_factor', 0.01))
        min_lr = float(sched_cfg.get('min_lr', 1e-7))
        warmup_steps = max(warmup_epochs * steps_per_epoch, 0)
        decay_steps = max(total_epochs * steps_per_epoch - warmup_steps, 1)
        return optax.warmup_cosine_decay_schedule(
            init_value=base_lr * warmup_factor, peak_value=base_lr,
            warmup_steps=max(warmup_steps, 1), decay_steps=decay_steps
            + max(warmup_steps, 1), end_value=min_lr)
    return optax.constant_schedule(base_lr)


def _make_optimizer(kind: str, learning_rate, opt_cfg: Dict[str, Any]
                    ) -> optax.GradientTransformation:
    if kind in ('adam', 'sgd') and opt_cfg.get('decay'):
        # The reference passes `decay` through to Keras 3, which warns
        # "Argument `decay` is no longer supported and will be ignored"
        # (verified against its pinned Keras) — so a nonzero value is a
        # silent no-op there.  Mirror that contract loudly.
        import warnings
        warnings.warn(f"optimizer.decay is ignored for {kind} (the "
                      "reference's Keras 3 runtime ignores it too); use "
                      "adamw with weight_decay for decoupled decay")
    if kind == 'adam':
        return optax.adam(learning_rate,
                          b1=float(opt_cfg.get('beta_1', 0.9)),
                          b2=float(opt_cfg.get('beta_2', 0.999)),
                          eps=float(opt_cfg.get('epsilon', 1e-7)))
    if kind == 'adamw':
        # the reference accepts `decay` as an alias for weight_decay here
        # (model_builder.py:58); default 5e-4 matches its fallback
        return optax.adamw(learning_rate,
                           b1=float(opt_cfg.get('beta_1', 0.9)),
                           b2=float(opt_cfg.get('beta_2', 0.999)),
                           eps=float(opt_cfg.get('epsilon', 1e-7)),
                           weight_decay=float(
                               opt_cfg.get('weight_decay',
                                           opt_cfg.get('decay', 5e-4))))
    if kind == 'sgd':
        # reference defaults: momentum 0.937, nesterov False
        # (model_builder.py:73-75)
        return optax.sgd(learning_rate,
                         momentum=float(opt_cfg.get('momentum', 0.937)),
                         nesterov=bool(opt_cfg.get('nesterov', False)))
    raise ValueError(f'unknown optimizer type {kind!r}')


def create_optimizer_from_config(config: Dict[str, Any],
                                 learning_rate=None, inject_lr: bool = False
                                 ) -> optax.GradientTransformation:
    """Adam / AdamW / SGD factory (reference model_builder.py:22-99).

    ``inject_lr=True`` wraps the optimizer in ``optax.inject_hyperparams`` so
    the learning rate lives in the optimizer state and can be changed
    mid-training (reduce-on-plateau) WITHOUT rebuilding the optimizer — the
    Keras ReduceLROnPlateau semantics of preserving Adam moments
    (reference trainers/trainer.py:398-409).
    """
    opt_cfg = config.get('optimizer', {}) or {}
    kind = (opt_cfg.get('type') or 'adam').lower()
    lr = learning_rate if learning_rate is not None else \
        resolve_learning_rate(config)
    if inject_lr:
        return optax.inject_hyperparams(
            lambda learning_rate: _make_optimizer(kind, learning_rate,
                                                  opt_cfg))(learning_rate=lr)
    return _make_optimizer(kind, lr, opt_cfg)


def get_model_info(config: Dict[str, Any]) -> Dict[str, Any]:
    """Config-level model introspection (reference model_builder.py:302-330).

    Same return schema as the reference: name/type/architecture/
    num_classes/input_shape/num_anchors_per_head, resolved from the
    ``model.preset`` or ``model.custom`` block without building anything.
    """
    model_cfg = config.get('model', {}) or {}
    info = {
        'name': model_cfg.get('name', 'unknown'),
        'type': model_cfg.get('type', 'preset'),
        'architecture': None,
        'num_classes': None,
        'input_shape': None,
        'num_anchors_per_head': [3, 3, 3],
    }
    if info['type'] == 'preset':
        preset = model_cfg.get('preset', {}) or {}
        info.update(
            architecture=preset.get('architecture'),
            num_classes=preset.get('num_classes'),
            input_shape=tuple(preset['input_shape'])
            if preset.get('input_shape') else None)
    elif info['type'] == 'custom':
        custom = model_cfg.get('custom', {}) or {}
        head = custom.get('head', {}) or {}
        info.update(
            architecture='custom_{}_{}_{}'.format(
                (custom.get('backbone', {}) or {}).get('type'),
                (custom.get('neck', {}) or {}).get('type'),
                head.get('type')),
            num_classes=head.get('num_classes', 80),
            input_shape=tuple(custom.get('input_shape', (608, 608, 3))))
    return info
