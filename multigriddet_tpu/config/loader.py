"""YAML configuration loading, merging, path resolution, and validation.

Keeps the reference's config surface intact
(/root/reference/multigriddet/config/config_loader.py:15-109) so its YAML
files transfer unchanged: two-level configs (a task YAML referencing a model
YAML via ``model_config:``, deep-merged), relative-path resolution by suffix
heuristic, and per-task required-key validation.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml

_PATH_SUFFIXES = ('.yaml', '.yml', '.txt', '.h5', '.msgpack', '.ckpt')

_REQUIRED_KEYS = {
    'train': ['data', 'training'],
    'infer': ['input', 'detection'],
    'eval': ['data', 'evaluation'],
}


class ConfigError(ValueError):
    pass


def merge_configs(base: Dict[str, Any],
                  override: Dict[str, Any]) -> Dict[str, Any]:
    """Deep-merge ``override`` into ``base`` (override wins on leaves)."""
    out = copy.deepcopy(base)
    for key, val in override.items():
        if (key in out and isinstance(out[key], dict)
                and isinstance(val, dict)):
            out[key] = merge_configs(out[key], val)
        else:
            out[key] = copy.deepcopy(val)
    return out


def resolve_paths(config: Dict[str, Any], base_dir: str) -> Dict[str, Any]:
    """Make relative path-like string values absolute w.r.t. ``base_dir``.

    Same suffix heuristic as the reference (config_loader.py:86-101).
    """
    def _resolve(value):
        if isinstance(value, dict):
            return {k: _resolve(v) for k, v in value.items()}
        if isinstance(value, list):
            return [_resolve(v) for v in value]
        if (isinstance(value, str) and value.endswith(_PATH_SUFFIXES)
                and not os.path.isabs(value)):
            return os.path.normpath(os.path.join(base_dir, value))
        return value
    return _resolve(config)


def validate_config(config: Dict[str, Any],
                    config_type: Optional[str] = None) -> None:
    """Check required sections and known-invalid values."""
    if config_type and config_type in _REQUIRED_KEYS:
        for key in _REQUIRED_KEYS[config_type]:
            if key not in config:
                raise ConfigError(
                    f'{config_type} config missing required section {key!r}')
    loss_option = (config.get('training', {}) or {}).get('loss_option')
    if loss_option is not None and loss_option not in (1, 2, 3):
        raise ConfigError(
            f'training.loss_option must be 1, 2 or 3, got {loss_option!r}')


def load_config(path: str,
                config_type: Optional[str] = None) -> Dict[str, Any]:
    """Load a YAML config; follow + merge its ``model_config`` reference."""
    with open(path) as f:
        config = yaml.safe_load(f) or {}
    raw_model_cfg = config.get('model_config')
    base_dir = os.path.dirname(os.path.abspath(path))
    config = resolve_paths(config, base_dir)

    model_cfg_path = config.get('model_config')
    if model_cfg_path:
        # the reference convention writes model_config repo-root-relative
        # ("configs/models/x.yaml") even inside configs/, so try the
        # config-dir-resolved path first, then the config dir's parent
        # (the repo root for configs/*.yaml), then cwd as a last resort —
        # a same-named file in an unrelated cwd must not shadow the
        # repo-root config
        candidates = [model_cfg_path if os.path.isabs(model_cfg_path)
                      else os.path.join(base_dir, model_cfg_path)]
        if raw_model_cfg and not os.path.isabs(raw_model_cfg):
            candidates.append(os.path.normpath(
                os.path.join(base_dir, os.pardir, raw_model_cfg)))
            candidates.append(os.path.normpath(
                os.path.join(os.getcwd(), raw_model_cfg)))
        model_cfg_path = next(
            (c for c in candidates if os.path.exists(c)), None)
        if model_cfg_path is None:
            print(f"WARNING: model_config {raw_model_cfg!r} resolved to no "
                  f"existing file (tried {candidates}); continuing without "
                  "the model preset merge.")
        if model_cfg_path:
            with open(model_cfg_path) as f:
                model_cfg = yaml.safe_load(f) or {}
            model_cfg = resolve_paths(
                model_cfg, os.path.dirname(os.path.abspath(model_cfg_path)))
            config = merge_configs(model_cfg, config)
    validate_config(config, config_type)
    return config
