#!/usr/bin/env python3
"""Port reference Keras .h5 weights to a flax .msgpack checkpoint.

Usage:
  python tools/port_keras_weights.py --h5 model5.h5 \
      --model-config configs/models/multigriddet_darknet.yaml \
      --out trained_models/model5.msgpack

Parity path for the reference's pretrained checkpoints (its weight files
are layer-order Keras HDF5; see multigriddet_tpu/models/porting.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from multigriddet_tpu.config import build_model_from_config, load_config
from multigriddet_tpu.models.porting import port_keras_weights
from multigriddet_tpu.training.checkpoint import save_params


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--h5', required=True)
    p.add_argument('--model-config',
                   default='configs/models/multigriddet_darknet.yaml')
    p.add_argument('--out', required=True)
    args = p.parse_args()

    config = load_config(args.model_config)
    model, spec = build_model_from_config(config)
    hw = tuple(spec['input_shape'][:2])
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), train=False))()
    ported = port_keras_weights(args.h5, variables, model=model,
                                input_hw=hw)
    save_params(args.out, ported)
    print(f'Wrote {args.out}')


if __name__ == '__main__':
    main()
