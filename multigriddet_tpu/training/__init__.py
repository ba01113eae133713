"""Training layer: state, sharded steps, checkpoints, trainer."""

from .calibrate import calibrate_batch_stats
from .checkpoint import CheckpointManager, load_params, save_params
from .state import (TrainState, count_params, create_train_state,
                    freeze_labels, partition_optimizer)
from .steps import (fetch_detections, make_eval_step, make_fused_train_step,
                    make_infer_step, make_mesh, make_train_step, replicate,
                    shard_batch, unpack_detections)
from .trainer import MultiGridTrainer

__all__ = [
    'calibrate_batch_stats', 'CheckpointManager', 'load_params', 'save_params', 'TrainState',
    'count_params', 'create_train_state', 'freeze_labels',
    'partition_optimizer', 'make_eval_step', 'make_fused_train_step',
    'make_infer_step', 'make_mesh',
    'unpack_detections', 'fetch_detections',
    'make_train_step', 'replicate', 'shard_batch', 'MultiGridTrainer',
]
