"""MultiGridDet-TPU: a TPU-native JAX object-detection framework.

A ground-up re-design of solufast-cvprojects/multigriddet (TF2/Keras) for
TPU: pure-function ops compiled by XLA, flax models, optax training, orbax
checkpoints, on-device augmentation/target-encoding/decode/NMS, and
data-parallel execution over a jax.sharding.Mesh.
"""

__version__ = '0.1.0'
