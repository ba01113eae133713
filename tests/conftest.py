"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX pattern for testing multi-device sharding without
TPU hardware (SURVEY.md §4): force the host platform and split it into 8
virtual devices before jax initializes.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    flags = (flags + ' --xla_force_host_platform_device_count=8').strip()
if '--xla_cpu_collective_call_terminate_timeout_seconds' not in flags:
    # XLA:CPU's hardcoded 40 s collective-rendezvous abort can fire
    # spuriously when 8 device threads timeshare this box's 1 core
    # through an uncached compile+execute (observed on the dryrun)
    flags += ' --xla_cpu_collective_call_terminate_timeout_seconds=600'
os.environ['XLA_FLAGS'] = flags
os.environ.setdefault('JAX_ENABLE_X64', '0')

# The axon sitecustomize imports jax at interpreter start, so env vars set
# here are too late for jax.config — override through the config API
# (backends are still uninitialized at conftest time, so XLA_FLAGS above
# still takes effect for the host platform device count).
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# Persistent compilation cache: this box has a single CPU core, so XLA
# compiles dominate test wall-time; cache them across runs.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.join(os.path.dirname(__file__), '..',
                                   '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope='session')
def coco_anchors():
    """The reference COCO anchor set (configs/yolov3_coco_anchor.txt)."""
    return [
        np.array([[112, 74], [149, 190], [370, 328]], np.float32),
        np.array([[28, 17], [56, 112], [57, 35]], np.float32),
        np.array([[9, 10], [13, 28], [28, 55]], np.float32),
    ]
