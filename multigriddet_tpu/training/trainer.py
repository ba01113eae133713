"""MultiGridTrainer: two-stage, data-parallel training orchestration.

TPU-native counterpart of the reference MultiGridTrainer
(/root/reference/multigriddet/trainers/trainer.py:103-594):

* two-stage training — ``transfer_epochs`` with frozen layers
  (freeze_level 0/1/2 via optax parameter partitioning), then unfreeze with
  a freshly-created optimizer and continue (trainer.py:454-581);
* cosine-annealing-with-warmup (per step) or reduce-on-plateau LR;
* checkpointing (orbax, full TrainState = exact resume incl. optimizer
  state — stronger than the reference's weights-only h5), early stopping;
* mixed precision via bfloat16 compute dtype (``environment.mixed_precision``);
* data parallelism over a 1-D device mesh from day one — batches are
  sharded over devices, parameters replicated, XLA inserts the collectives.

Metrics go to console + a JSONL history file (TensorBoard's scalar format
is derivable from it; the reference only logged Keras scalars).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..config import (build_model_from_config, class_weights_from_config,
                      create_optimizer_from_config, loss_config_from_config,
                      make_lr_schedule, resolve_learning_rate)
from ..data import MultiGridDataGenerator, load_annotation_lines
from .checkpoint import (CheckpointManager, load_backbone_flexible,
                         load_weights_flexible, save_params)
from .state import TrainState, count_params, create_train_state, \
    partition_optimizer
from ..parallel import distributed as dist
from ..parallel import image_partition_spec
from .steps import (make_eval_step, make_fused_train_step, make_mesh,
                    make_train_step)


class MultiGridTrainer:

    _fused_steps = None  # set per stage by _make_stage

    def __init__(self, config: Dict[str, Any], mesh=None):
        self.config = config
        env = config.get('environment', {}) or {}
        # multi-host: wire the coordination service BEFORE the first
        # jax.devices() call so the mesh below spans the whole pod slice
        dist.maybe_initialize(env.get('distributed'))
        self.compute_dtype = (jnp.bfloat16 if env.get('mixed_precision')
                              else jnp.float32)
        self.training_cfg = config.get('training', {}) or {}
        if mesh is not None:
            self.mesh = mesh
        else:
            batch = int(self.training_cfg.get('batch_size', 8))
            devices = jax.devices()
            sp = int(env.get('spatial_partition', 1) or 1)
            if sp > 1 and len(devices) % sp == 0:
                # 2-D mesh: data x spatial partitioning (images sharded
                # over H, convs halo-exchanged by GSPMD)
                from ..parallel import make_mesh_2d
                dp = len(devices) // sp
                while dp > 1 and batch % dp != 0:
                    dp -= 1
                self.mesh = make_mesh_2d(dp, sp, devices[:dp * sp])
            else:
                # largest device count that divides the batch size so the
                # batch shards evenly over the mesh
                n = len(devices)
                while n > 1 and batch % n != 0:
                    n -= 1
                self.mesh = make_mesh(devices[:n])
        self.output_cfg = config.get('output', {}) or {}
        self.callbacks_cfg = config.get('callbacks', {}) or {}
        self.history = []

    # ------------------------------------------------------------------
    # Setup
    # ------------------------------------------------------------------

    def setup_data(self):
        data_cfg = self.config.get('data', {}) or {}
        aug_cfg = dict(self.training_cfg.get('augmentation', {}) or {})
        # training.batch_size is the GLOBAL batch; each process's
        # generator yields its 1/process_count local shard
        batch_size = dist.local_batch_size(
            int(self.training_cfg.get('batch_size', 8)))
        max_boxes = int(aug_cfg.pop('max_boxes_per_image', 100))
        rescale_interval = int(aug_cfg.pop('rescale_interval', -1))
        # multi-process: seed the load-time shuffle so every process
        # agrees on the order it is sharding (disjoint equal shards)
        self.train_lines = dist.shard_lines(load_annotation_lines(
            data_cfg['train_annotation'],
            seed=0 if dist.is_multiprocess() else None))
        val_path = data_cfg.get('val_annotation')
        self.val_lines = dist.shard_lines(
            load_annotation_lines(val_path, shuffle=False)
            if val_path and os.path.exists(val_path) else [])
        hw = tuple(self.spec['input_shape'][:2])
        loader_cfg = self.config.get('data_loader', {}) or {}
        workers = int(loader_cfg.get('num_workers', 8))
        cache_images = bool(loader_cfg.get('cache_images', False))
        disk_cache_dir = loader_cfg.get('disk_cache_dir')
        # HBM-resident decoded-image bank (pipeline._DeviceImageCache):
        # epoch >= 2 assembles batches on device, independent of the
        # host->device link.  Budget-gated: datasets that don't fit keep
        # the streaming path (a warning says which canvas fell back).
        cache_device = bool(loader_cfg.get('cache_images_device', False))
        device_budget = int(float(loader_cfg.get(
            'device_cache_budget_gb', 4.0)) * (1 << 30))
        # ONE byte ledger shared by the train + val caches so the
        # configured budget bounds TOTAL HBM use, not per-generator
        device_ledger = {'bytes': 0} if cache_device else None
        multi_anchor = bool(self.training_cfg.get('multi_anchor_assign',
                                                  False))
        # link transport for the train stream ('auto' = yuv420: half the
        # host->device bytes per batch, inverted on device — ops/yuv.py)
        link_format = loader_cfg.get('link_format', 'auto')
        self.train_gen = MultiGridDataGenerator(
            self.train_lines, self.spec['anchors'], self.spec['num_classes'],
            hw, batch_size, max_boxes, aug_cfg, train=True,
            rescale_interval=rescale_interval, num_workers=workers,
            multi_anchor_assign=multi_anchor, cache_images=cache_images,
            disk_cache_dir=disk_cache_dir,
            cache_images_device=cache_device,
            device_cache_budget=device_budget,
            device_cache_ledger=device_ledger,
            link_format=link_format)
        self.val_gen = MultiGridDataGenerator(
            self.val_lines, self.spec['anchors'], self.spec['num_classes'],
            hw, batch_size, max_boxes, {'enabled': False}, train=False,
            num_workers=workers,
            disk_cache_dir=disk_cache_dir,
            cache_images_device=cache_device,
            device_cache_budget=device_budget,
            device_cache_ledger=device_ledger) if self.val_lines else None

    def build_model(self, rng_seed: int = 0):
        self.model, self.spec = build_model_from_config(
            self.config, dtype=self.compute_dtype)
        hw = tuple(self.spec['input_shape'][:2])
        dummy = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
        variables = jax.jit(
            lambda: self.model.init(jax.random.PRNGKey(rng_seed), dummy,
                                    train=False))()
        self.init_params = variables['params']
        self.init_batch_stats = variables.get('batch_stats', {})

        # pretrained weights load whenever a path is given; resume.enabled
        # gates ONLY the checkpoint restore (optimizer state + epoch) —
        # the reference's exact contract (reference trainer.py:308-322)
        resume = self.config.get('resume', {}) or {}
        if resume.get('weights_path'):
            # accepts a bare params tree OR a {'params','batch_stats'}
            # bundle (final_model.msgpack), restoring BN stats when present
            self.init_params, self.init_batch_stats = load_weights_flexible(
                resume['weights_path'], self.init_params,
                self.init_batch_stats)
            print(f"Loaded full weights from {resume['weights_path']}")
        elif resume.get('backbone_weights_path'):
            path = resume['backbone_weights_path']
            backbone, bb_stats = load_backbone_flexible(
                path, self.init_params['backbone'],
                (self.init_batch_stats or {}).get('backbone'))
            self.init_params = dict(self.init_params, backbone=backbone)
            if bb_stats is not None and self.init_batch_stats:
                self.init_batch_stats = dict(self.init_batch_stats,
                                             backbone=bb_stats)
            print(f'Loaded backbone weights from {path}')
        print(f"Model: {self.spec['architecture']}  "
              f"params: {count_params(self.init_params)/1e6:.2f}M  "
              f"input: {hw}  classes: {self.spec['num_classes']}")

    # ------------------------------------------------------------------
    # Stage runner
    # ------------------------------------------------------------------

    def _make_stage(self, freeze_level: int, start_epoch: int,
                    params, batch_stats, lr_override=None, ema_params=None):
        steps_per_epoch = max(len(self.train_gen), 1)
        total_epochs = int(self.training_cfg.get('epochs', 1))
        accum = int(self.training_cfg.get('gradient_accumulation', 1) or 1)
        # the schedule advances once per OPTIMIZER UPDATE (MultiSteps
        # applies one update per `accum` batches)
        updates_per_epoch = max(steps_per_epoch // max(accum, 1), 1)
        schedule = make_lr_schedule(self.config, updates_per_epoch,
                                    total_epochs)
        if start_epoch > 0:
            # each stage's fresh optimizer counts from 0: shift the
            # schedule by the epochs already trained so warmup/cosine
            # track the GLOBAL epoch across the freeze boundary and
            # resumes, like the reference's CosineAnnealingWithWarmup
            # callback (reference trainer.py:23-100)
            base_schedule, offset = schedule, start_epoch * updates_per_epoch
            schedule = lambda count: base_schedule(count + offset)
        sched_cfg = self.config.get('lr_schedule', {}) or {}
        if sched_cfg.get('type') == 'reduce_on_plateau':
            base_lr = lr_override or resolve_learning_rate(self.config)
            self._plateau_lr = base_lr
            # inject_lr puts the LR in the optimizer state so plateau
            # reductions mutate it in place, preserving adam moments
            # (Keras ReduceLROnPlateau semantics, ref trainer.py:398-409)
            opt = create_optimizer_from_config(self.config, base_lr,
                                               inject_lr=True)
        else:
            opt = create_optimizer_from_config(self.config, schedule)
        if accum > 1:
            # large effective batches without more HBM
            opt = optax.MultiSteps(opt, every_k_schedule=accum)
        tx = partition_optimizer(opt, params, freeze_level)
        state = create_train_state(params, batch_stats, optax.identity(),
                                   freeze_level=0)
        state = state.replace(opt_state=tx.init(params))
        ema_decay = self.training_cfg.get('ema_decay')
        ema_decay = float(ema_decay) if ema_decay else None
        if ema_decay is not None:
            # EMA weight averaging (beyond-reference): seed from the
            # previous stage's average, or from a COPY of the current
            # params — the train step donates its input state, and a
            # seed aliasing params would put the same buffer in the
            # donated arguments twice (XLA rejects double donation)
            if ema_params is None:
                ema_params = jax.tree.map(
                    lambda x: jnp.array(x, copy=True), params)
            state = state.replace(ema_params=ema_params)
        loss_cfg = loss_config_from_config(self.config)
        cw = class_weights_from_config(
            self.config, self.spec['num_classes'], self.train_lines)
        cw = jnp.asarray(cw) if cw is not None else None
        hw = tuple(self.spec['input_shape'][:2])
        train_step = make_train_step(
            self.model, tx, self.spec['anchors'], self.spec['num_classes'],
            hw, loss_cfg, cw, mesh=self.mesh, freeze_level=freeze_level,
            ema_decay=ema_decay)
        # fused single-program path (training.fused_input_stage, default
        # on): aug + 9-cell encode + forward + backward + update in ONE
        # XLA dispatch per batch, fed raw uint8 batches (or HBM-bank
        # gathers) by iter_raw — halves per-batch host dispatches and
        # deletes the intermediate f32-image + y_true HBM round-trip.
        # Multi-process keeps the two-program path: its put_global
        # contract assembles GLOBAL arrays from per-host shards, which
        # the per-host bank gather can't express.
        self._fused_steps = None
        if (bool(self.training_cfg.get('fused_input_stage', True))
                and not dist.is_multiprocess()):
            self._fused_steps = make_fused_train_step(
                self.model, tx, self.spec['anchors'],
                self.spec['num_classes'], loss_cfg,
                aug_cfg=self.train_gen.augment_cfg, class_weights=cw,
                mesh=self.mesh, freeze_level=freeze_level,
                ema_decay=ema_decay,
                multi_anchor_assign=self.train_gen.multi_anchor_assign)
        eval_step = make_eval_step(
            self.model, self.spec['anchors'], self.spec['num_classes'],
            hw, loss_cfg, cw, mesh=self.mesh)
        return state, train_step, eval_step, schedule

    def _train_batches(self, state):
        """Yield ``(state, metrics)`` per batch — fused single-program
        path when enabled, otherwise the two-program generator path."""
        if self._fused_steps is not None:
            host_step, bank_step = self._fused_steps
            for item in self.train_gen.iter_raw():
                if item[0] == 'bank':
                    _, bank, idx, boxes, hw, key = item
                    state, metrics = bank_step(
                        state, bank, jnp.asarray(idx), jnp.asarray(boxes),
                        key)
                else:
                    _, images_u8, boxes, hw, key = item
                    state, metrics = host_step(
                        state, images_u8, jnp.asarray(boxes), key)
                yield state, metrics
            return
        batch_spec = jax.sharding.PartitionSpec('batch')
        train_step = self._train_step
        for images, y_true, _ in self.train_gen:
            # put_global: plain sharded device_put single-process; the
            # process-local shard of the global batch under multi-host
            # (generator seeds keep multi-scale shapes in lockstep
            # across processes, so collectives never see mixed shapes)
            images = dist.put_global(
                self.mesh, image_partition_spec(self.mesh), images)
            y_true = tuple(dist.put_global(self.mesh, batch_spec, y)
                           for y in y_true)
            state, metrics = train_step(state, images, y_true)
            yield state, metrics

    def _run_epoch(self, state, train_step, epoch: int):
        t0 = time.time()
        agg, n = {}, 0
        self._train_step = train_step
        for state, metrics in self._train_batches(state):
            n += 1
            if (n % 50 == 0 or n == 1) and dist.is_primary():
                m = {k: float(v) for k, v in metrics.items()}
                print(f'  epoch {epoch} step {n}/{len(self.train_gen)} '
                      f"loss={m['loss']:.4f} loc={m['location']:.4f} "
                      f"obj={m['objectness']:.4f}")
            # accumulate on device; fetch once per epoch (a per-step host
            # sync would serialize every step on the host link RTT)
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + v
        agg = {k: float(v) for k, v in agg.items()}
        if self.training_cfg.get('nan_check', True) and not all(
                jnp.isfinite(jnp.asarray(v)) for v in agg.values()):
            bad = {k: v for k, v in agg.items()
                   if not float(jnp.isfinite(jnp.asarray(v)))}
            raise FloatingPointError(
                f'non-finite training metrics at epoch {epoch}: {bad} '
                f'(the reference guards with assert_all_finite; set '
                f'training.nan_check: false to disable)')
        dt = time.time() - t0
        avg = {k: v / max(n, 1) for k, v in agg.items()}
        avg['epoch_time_s'] = dt
        avg['steps'] = n
        # global images (all processes), not just this host's shard
        bsz = self.train_gen.batch_size * jax.process_count()
        avg['images_per_sec'] = n * bsz / dt if dt > 0 else 0.0
        return state, avg

    def _run_validation(self, state, eval_step):
        if self.val_gen is None:
            return {}
        if (state.ema_params is not None
                and self.training_cfg.get('ema_eval', True)):
            # validate (and therefore checkpoint/early-stop) on the EMA
            # weights — they are what gets exported.  BN running stats stay
            # the live ones; pair training.bn_recalibrate with EMA for
            # exactly-matched statistics at export time.
            state = state.replace(params=state.ema_params)
        agg, n = {}, 0
        batch_spec = jax.sharding.PartitionSpec('batch')
        for images, y_true, _ in self.val_gen:
            images = dist.put_global(
                self.mesh, image_partition_spec(self.mesh), images)
            y_true = tuple(dist.put_global(self.mesh, batch_spec, y)
                           for y in y_true)
            metrics = eval_step(state, images, y_true)
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + v
            n += 1
        return {f'val_{k}': float(v) / max(n, 1) for k, v in agg.items()}

    # ------------------------------------------------------------------
    # Main loop
    # ------------------------------------------------------------------

    def train(self):
        self.build_model()
        self.setup_data()

        model_dir = self.output_cfg.get('model_dir', 'trained_models')
        log_dir = self.output_cfg.get('log_dir', 'logs/training')
        os.makedirs(model_dir, exist_ok=True)
        os.makedirs(log_dir, exist_ok=True)
        tb_cfg = self.callbacks_cfg.get('tensorboard', {}) or {}
        tb_writer = None
        if tb_cfg:
            try:
                from torch.utils.tensorboard import SummaryWriter
                tb_writer = SummaryWriter(
                    tb_cfg.get('log_dir', os.path.join(log_dir,
                                                       'tensorboard')))
            except ImportError:
                pass
        ckpt_cfg = self.callbacks_cfg.get('checkpoint', {}) or {}
        ckpt = CheckpointManager(
            ckpt_cfg.get('save_dir', os.path.join(log_dir, 'checkpoints')),
            monitor=ckpt_cfg.get('monitor', 'val_loss'),
            save_best_only=bool(ckpt_cfg.get('save_best_only', False)))
        es_cfg = self.callbacks_cfg.get('early_stopping', {}) or {}
        es_patience = int(es_cfg.get('patience', 0) or 0)
        sched_cfg = self.config.get('lr_schedule', {}) or {}

        epochs = int(self.training_cfg.get('epochs', 1))
        initial_epoch = int(self.training_cfg.get('initial_epoch', 0))
        transfer_epochs = int(self.training_cfg.get('transfer_epochs', 0))
        freeze_level = int(self.training_cfg.get('freeze_level', 0))

        params, batch_stats = self.init_params, self.init_batch_stats
        ema_params = None
        best_val = float('inf')
        patience_count = 0
        plateau_patience = int(sched_cfg.get('patience', 3))
        plateau_factor = float(sched_cfg.get('factor', 0.5))
        plateau_count = 0
        epoch = initial_epoch

        stages = []
        if transfer_epochs > initial_epoch and freeze_level > 0:
            stages.append((freeze_level, transfer_epochs))
        stages.append((0, epochs))

        # optional resume of full state from latest checkpoint
        resume = self.config.get('resume', {}) or {}
        restore_state = (bool(resume.get('enabled'))
                         and ckpt.latest_step() is not None)
        if restore_state:
            # checkpoints are keyed by the epoch they completed; bump the
            # epoch BEFORE stage selection so a run that crashed after the
            # unfreeze restores into the stage-2 optimizer template (a
            # stage-1 multi_transform template cannot hold a stage-2
            # opt_state tree, and vice versa)
            epoch = max(epoch, int(ckpt.latest_step()) + 1)

        for stage_idx, (fl, until_epoch) in enumerate(stages):
            if epoch >= until_epoch:
                continue
            lr_override = getattr(self, '_plateau_lr', None)
            state, train_step, eval_step, schedule = self._make_stage(
                fl, epoch, params, batch_stats, lr_override, ema_params)
            if restore_state:
                # allow_mismatch: a checkpoint saved in the OTHER stage
                # restores params/batch_stats/step with this stage's fresh
                # optimizer (exactly what an unresumed run does at the
                # freeze boundary)
                state = ckpt.restore(state, allow_mismatch=True)
                # orbax restores onto the default device; replicate over the
                # mesh so the sharded train step accepts it
                state = jax.device_put(
                    state, jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec()))
                epoch = max(epoch, int(state.step) // max(
                    len(self.train_gen), 1))
                restore_state = False
                print(f'Resumed from checkpoint at epoch {epoch}')
            print(f'--- stage {stage_idx + 1}: freeze_level={fl}, '
                  f'epochs {epoch} -> {until_epoch} ---')
            while epoch < until_epoch:
                state, train_m = self._run_epoch(state, train_step, epoch)
                val_m = self._run_validation(state, eval_step)
                record = {'epoch': epoch, **train_m, **val_m}
                self.history.append(record)
                if dist.is_primary():
                    # host 0 owns the log files; metrics are global
                    # (computed over the full sharded batch), so every
                    # process would write identical records anyway
                    with open(os.path.join(log_dir, 'history.jsonl'),
                              'a') as f:
                        f.write(json.dumps(record) + '\n')
                if tb_writer is not None and dist.is_primary():
                    for k, v in record.items():
                        if isinstance(v, (int, float)):
                            tb_writer.add_scalar(k, v, epoch)
                    tb_writer.flush()
                monitor = val_m.get('val_loss', train_m.get('loss', 0.0))
                if dist.is_primary():
                    print(f"epoch {epoch}: "
                          f"loss={train_m.get('loss', 0):.4f} "
                          f"val_loss="
                          f"{val_m.get('val_loss', float('nan')):.4f} "
                          f"({train_m.get('images_per_sec', 0):.1f} "
                          f"img/s)")
                save_freq = int(self.output_cfg.get('save_frequency', 1)
                                or 1)
                if epoch % save_freq == 0 or epoch + 1 == until_epoch:
                    ckpt.save(epoch, state,
                              {'val_loss': monitor, **{k: v for k, v in
                                                       train_m.items()
                                                       if k == 'loss'}})
                # early stopping / plateau bookkeeping
                if monitor < best_val - 1e-6:
                    best_val = monitor
                    patience_count = 0
                    plateau_count = 0
                else:
                    patience_count += 1
                    plateau_count += 1
                    if (sched_cfg.get('type') == 'reduce_on_plateau'
                            and plateau_count >= plateau_patience):
                        self._plateau_lr = max(
                            getattr(self, '_plateau_lr',
                                    resolve_learning_rate(self.config))
                            * plateau_factor,
                            float(sched_cfg.get('min_lr', 1e-7)))
                        print(f'Reducing LR to {self._plateau_lr:.2e}')
                        plateau_count = 0
                        # mutate the injected LR inside the optimizer state;
                        # adam moments survive the reduction (the reference's
                        # ReduceLROnPlateau never resets optimizer state)
                        state = state.replace(
                            opt_state=optax.tree_utils.tree_set(
                                state.opt_state,
                                learning_rate=jnp.asarray(
                                    self._plateau_lr, jnp.float32)))
                if es_patience and patience_count >= es_patience:
                    print(f'Early stopping at epoch {epoch} '
                          f'(no improvement for {es_patience} epochs)')
                    epoch += 1
                    break
                epoch += 1
            params = state.params
            batch_stats = state.batch_stats
            ema_params = state.ema_params
            if es_patience and patience_count >= es_patience:
                break

        if restore_state:
            # every configured epoch was already trained before the resume:
            # no stage ran, so pull the weights from the checkpoint for the
            # final export instead of saving the fresh init
            raw = ckpt.restore_raw()
            params, batch_stats = raw['params'], raw['batch_stats']
            ema_params = raw.get('ema_params')
            print('Resume found training already complete; exporting the '
                  'checkpointed weights')

        export_params = params
        if ema_params is not None and jax.tree_util.tree_leaves(ema_params):
            # EMA weights are the deployment weights (training.ema_decay)
            export_params = ema_params
            print('Exporting EMA-averaged weights '
                  f"(decay={self.training_cfg.get('ema_decay')})")

        if self.training_cfg.get('bn_recalibrate', False):
            # BN running stats lag the weights on short/frozen schedules;
            # recompute them over a sweep of training batches before saving
            # (training.bn_recalibrate / bn_recalibrate_batches)
            from .calibrate import calibrate_batch_stats
            bn_mom = float(
                (self.config.get('model', {}) or {}).get(
                    'preset', {}).get(
                    'bn_momentum', self.training_cfg.get('bn_momentum',
                                                         0.99)))
            n_cal = int(self.training_cfg.get('bn_recalibrate_batches', 32))
            # place batches globally: BN's batch-axis reductions then run
            # as cross-device/cross-host collectives, so every process
            # derives the SAME stats (local numpy inputs would silently
            # diverge across hosts)
            spec = image_partition_spec(self.mesh)
            batch_stats = calibrate_batch_stats(
                self.model, export_params, batch_stats,
                (dist.put_global(self.mesh, spec, img)
                 for img, _, _ in self.train_gen),
                max_batches=n_cal, bn_momentum=bn_mom)
            print(f'Recalibrated BN statistics over {n_cal} batches')

        final_path = os.path.join(model_dir, 'final_model.msgpack')
        if dist.is_primary():
            # params are replicated, so host 0 holds the full model
            save_params(final_path, {'params': export_params,
                                     'batch_stats': batch_stats})
            print(f'Saved final model to {final_path}')
        if tb_writer is not None:
            tb_writer.close()
        ckpt.close()
        return self.history
