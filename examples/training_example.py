#!/usr/bin/env python3
"""Python-API training example (counterpart of the reference's
examples/training_example.py): drive MultiGridTrainer directly with an
in-memory config."""

import os
import sys

# run from a source checkout without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multigriddet_tpu.config import load_config
from multigriddet_tpu.training import MultiGridTrainer


def main():
    config = load_config('configs/train_config.yaml', config_type='train')
    # tweak anything programmatically before training:
    config['training']['epochs'] = 3
    config['training']['batch_size'] = 8
    trainer = MultiGridTrainer(config)
    history = trainer.train()
    print('final train loss:', history[-1].get('loss'))


if __name__ == '__main__':
    main()
