#!/usr/bin/env python3
"""Serving-artifact example: export once, serve anywhere.

Exports the configured model as a self-contained jax.export artifact
(weights folded in), then reloads it THROUGH THE ARTIFACT ALONE and
runs a batch — the deployment path needs jax + numpy, not the
framework. (The reference has no export story; its engine rebuilds the
Keras graph + h5 inside the full framework per process.)

Usage: python examples/serving_example.py [image.jpg ...]
"""

import os
import sys

# run from a source checkout without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main():
    out_dir = 'serving_artifact'
    if not os.path.exists(os.path.join(out_dir, 'metadata.json')):
        # --- export side (needs the framework; run once) ---
        from multigriddet_tpu.config import load_config
        from multigriddet_tpu.inference import (MultiGridInference,
                                                export_serving)
        config = load_config('configs/infer_config.yaml',
                             config_type='infer')
        engine = MultiGridInference(config)
        # mirror EVERY configured postprocess knob (as tools/
        # export_serving.py does) so the artifact can't silently
        # disagree with the live engine's keep-sets
        export_serving(engine.model, engine.variables,
                       engine.spec['anchors'], engine.input_hw, out_dir,
                       batch_sizes=[1, 8], class_names=engine.class_names,
                       confidence=engine.confidence,
                       nms_threshold=engine.nms_threshold,
                       nms_method=engine.nms_method,
                       use_iol=engine.use_iol,
                       class_aware=engine.class_aware,
                       max_boxes=engine.max_boxes,
                       pre_nms_top_k=engine.pre_nms_top_k)
        print(f'exported -> {out_dir}/')

    # --- serving side (jax + numpy only) ---
    from multigriddet_tpu.inference import ServingModel
    from multigriddet_tpu.data.annotations import letterbox_image
    serving = ServingModel(out_dir)
    paths = sys.argv[1:] or ['examples/images/dog.jpg']
    h, w = serving.input_hw
    canvases = []
    for p in paths:
        canvas, _, _, _ = letterbox_image(Image.open(p).convert('RGB'),
                                          (h, w))
        canvases.append(canvas.astype(np.uint8))
    boxes, classes, scores, valid = serving(np.stack(canvases))
    for p, bx, cl, sc, va in zip(paths, boxes, classes, scores, valid):
        print(p)
        for box, c, s in zip(bx[va], cl[va], sc[va]):
            name = (serving.class_names[int(c)]
                    if serving.class_names else str(int(c)))
            x, y, bw, bh = box
            print(f'  {name:>16} {s:.3f}  '
                  f'[{x:.0f}, {y:.0f}, {bw:.0f}x{bh:.0f}] (canvas px)')


if __name__ == '__main__':
    main()
