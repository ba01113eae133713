"""Component registry: backbones, necks, heads, and full detectors.

The TPU-native counterpart of the reference's ModelRegistry
(/root/reference/multigriddet/models/registry.py:13-305): decorator-based
registration plus a ``create_model`` factory used by the config layer.
Components here are flax ``nn.Module`` classes, so "composition" is just
module construction — no Keras graph surgery required.
"""

from __future__ import annotations

from typing import Callable, Dict, Type

_BACKBONES: Dict[str, Type] = {}
_NECKS: Dict[str, Type] = {}
_HEADS: Dict[str, Type] = {}
_MODELS: Dict[str, Callable] = {}


def register_backbone(name: str):
    def deco(cls):
        _BACKBONES[name] = cls
        return cls
    return deco


def register_neck(name: str):
    def deco(cls):
        _NECKS[name] = cls
        return cls
    return deco


def register_head(name: str):
    def deco(cls):
        _HEADS[name] = cls
        return cls
    return deco


def register_model(name: str):
    def deco(fn):
        _MODELS[name] = fn
        return fn
    return deco


def get_backbone(name: str) -> Type:
    if name not in _BACKBONES:
        raise KeyError(
            f'Unknown backbone {name!r}; available: {sorted(_BACKBONES)}')
    return _BACKBONES[name]


def get_neck(name: str) -> Type:
    if name not in _NECKS:
        raise KeyError(f'Unknown neck {name!r}; available: {sorted(_NECKS)}')
    return _NECKS[name]


def get_head(name: str) -> Type:
    if name not in _HEADS:
        raise KeyError(f'Unknown head {name!r}; available: {sorted(_HEADS)}')
    return _HEADS[name]


def create_model(name: str, **kwargs):
    """Instantiate a registered full detector by name."""
    if name not in _MODELS:
        raise KeyError(f'Unknown model {name!r}; available: {sorted(_MODELS)}')
    return _MODELS[name](**kwargs)


def list_components() -> Dict[str, list]:
    return {
        'backbones': sorted(_BACKBONES),
        'necks': sorted(_NECKS),
        'heads': sorted(_HEADS),
        'models': sorted(_MODELS),
    }


def list_available_models() -> Dict[str, list]:
    """Reference-named alias of :func:`list_components`
    (reference models/registry.py:308-320)."""
    return list_components()
