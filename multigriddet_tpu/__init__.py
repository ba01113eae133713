"""MultiGridDet-TPU: a TPU-native JAX object-detection framework.

A ground-up re-design of solufast-cvprojects/multigriddet (TF2/Keras) for
TPU: pure-function ops compiled by XLA, flax models, optax training, orbax
checkpoints, on-device augmentation/target-encoding/decode/NMS, and
data-parallel execution over a jax.sharding.Mesh.
"""

__version__ = '0.1.0'


def _enable_persistent_compile_cache():
    """Turn on JAX's persistent compilation cache unless configured.

    The flagship model costs 60-130 s to compile; without this every CLI
    invocation re-pays it.  Respects an existing setting (user config or
    JAX_COMPILATION_CACHE_DIR env) and never fails the import — jax may
    be absent or too old in doc-build environments.
    """
    import os
    try:
        import jax
        if jax.config.jax_compilation_cache_dir:  # already configured
            return
        path = os.environ.get(
            'MULTIGRIDDET_CACHE_DIR',
            os.path.join(os.path.expanduser('~'), '.cache',
                         'multigriddet_tpu', 'jax_cache'))
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


_enable_persistent_compile_cache()

# Subpackages are imported lazily so `import multigriddet_tpu` stays cheap
# (importing models pulls in flax; training pulls optax/orbax).
_SUBPACKAGES = ('ops', 'models', 'losses', 'data', 'config', 'training',
                'inference', 'evaluation', 'postprocess', 'parallel',
                'utils')


# Top-level convenience symbols matching the reference package surface
# (/root/reference/multigriddet/__init__.py:63-66), resolved lazily.
_CONVENIENCE = {
    'create_model': ('models', 'create_model'),
    'list_available_models': ('models', 'list_available_models'),
    'draw_boxes': ('utils', 'draw_boxes'),
}


def __getattr__(name):
    import importlib
    if name in _SUBPACKAGES:
        module = importlib.import_module(f'.{name}', __name__)
        globals()[name] = module
        return module
    if name in _CONVENIENCE:
        subpkg, attr = _CONVENIENCE[name]
        value = getattr(importlib.import_module(f'.{subpkg}', __name__),
                        attr)
        globals()[name] = value
        return value
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')


def __dir__():
    return sorted(set(globals()) | set(_SUBPACKAGES) | set(_CONVENIENCE))
