#!/usr/bin/env python3
"""Live camera detection example (counterpart of the reference's
examples/camera_example.py).  Press 'q' to quit."""

import os
import sys

# run from a source checkout without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multigriddet_tpu.config import load_config
from multigriddet_tpu.inference import MultiGridInference


def main():
    config = load_config('configs/infer_config.yaml', config_type='infer')
    engine = MultiGridInference(config)
    cam_cfg = config.get('camera', {}) or {}
    engine.predict_camera(int(cam_cfg.get('device_id', 0)), show=True)


if __name__ == '__main__':
    main()
