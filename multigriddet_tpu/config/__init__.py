"""Configuration layer: YAML loading + model/loss/optimizer factories."""

from .builder import (build_model_for_inference, build_model_for_training,
                      build_model_from_config, class_weights_from_config,
                      create_optimizer_from_config, get_model_info,
                      loss_config_from_config, make_lr_schedule,
                      model_spec_from_config, resolve_compute_dtype,
                      resolve_learning_rate)
from .loader import (ConfigError, load_config, merge_configs, resolve_paths,
                     validate_config)

__all__ = [
    'ConfigError', 'load_config', 'merge_configs', 'resolve_paths',
    'validate_config', 'build_model_for_inference',
    'build_model_for_training', 'build_model_from_config',
    'class_weights_from_config', 'create_optimizer_from_config',
    'get_model_info',
    'loss_config_from_config', 'make_lr_schedule', 'model_spec_from_config',
    'resolve_compute_dtype', 'resolve_learning_rate',
]
