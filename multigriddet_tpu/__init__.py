"""MultiGridDet-TPU: a TPU-native JAX object-detection framework.

A ground-up re-design of solufast-cvprojects/multigriddet (TF2/Keras) for
TPU: pure-function ops compiled by XLA, flax models, optax training, orbax
checkpoints, on-device augmentation/target-encoding/decode/NMS, and
data-parallel execution over a jax.sharding.Mesh.
"""

__version__ = '0.1.0'

# Subpackages are imported lazily so `import multigriddet_tpu` stays cheap
# (importing models pulls in flax; training pulls optax/orbax).
_SUBPACKAGES = ('ops', 'models', 'losses', 'data', 'config', 'training',
                'inference', 'evaluation', 'postprocess', 'parallel',
                'utils')


def __getattr__(name):
    if name in _SUBPACKAGES:
        import importlib
        module = importlib.import_module(f'.{name}', __name__)
        globals()[name] = module
        return module
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')


def __dir__():
    return sorted(list(globals()) + list(_SUBPACKAGES))
