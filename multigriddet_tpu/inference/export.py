"""Serving export: the fused inference step as a self-contained artifact.

``jax.export`` serializes the WHOLE fused program — forward + decode +
NMS, weights folded in as constants — to portable StableHLO.  The
artifact reloads and serves with jax alone: no flax modules, no model
registry, no config system, no weight files.  That is the TPU-native
deployment story; the reference has no export path at all — its
inference engine rebuilds the Keras graph and loads h5 weights inside
the full framework every time
(/root/reference/multigriddet/inference/inference_engine.py:24-80).

Artifacts are multi-platform by default (``platforms=('cpu', 'tpu')``):
one export serves on a TPU pod and smoke-tests on a CPU dev box.

Layout of an exported directory::

    serving/
      program_b{N}.jaxexport   one serialized program per batch size
      metadata.json            input spec, classes, decode/NMS params
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..training.steps import make_infer_step

_META = 'metadata.json'


def export_serving(model, variables, anchors: Sequence[np.ndarray],
                   input_hw: Tuple[int, int], out_dir: str,
                   batch_sizes: Sequence[int] = (1,),
                   class_names: Optional[List[str]] = None,
                   platforms: Sequence[str] = ('cpu', 'tpu'),
                   **infer_kwargs) -> Dict[str, Any]:
    """Export the fused infer step for serving.

    Args:
      model / variables: detector module + trained weights (folded into
        the artifact as constants).
      anchors: per-scale anchor arrays.
      input_hw: model canvas (H, W).
      out_dir: artifact directory (created).
      batch_sizes: one program is exported per batch size (static shapes
        keep the XLA plan optimal per batch; the loader picks the
        smallest program that fits and pads).
      class_names: stored in metadata for the serving side.
      platforms: lowering platforms baked into the artifact.
      **infer_kwargs: make_infer_step knobs (confidence, nms_method,
        pre_nms_top_k, ...).  ``nms_backend='pallas*'`` is rejected —
        Pallas kernels are not portable across platforms.

    Returns the metadata dict.
    """
    if str(infer_kwargs.get('nms_backend', 'xla')).startswith('pallas'):
        raise ValueError('serving export requires the portable XLA NMS '
                         'backend (pallas kernels do not cross-lower)')
    os.makedirs(out_dir, exist_ok=True)
    step = make_infer_step(model, anchors, input_hw, **infer_kwargs)

    def serve(images):  # weights are closure constants
        return step(variables, images)

    programs = {}
    for b in sorted(set(int(b) for b in batch_sizes)):
        spec = jax.ShapeDtypeStruct((b, *input_hw, 3), jnp.uint8)
        exp = jax.export.export(jax.jit(serve),
                                platforms=list(platforms))(spec)
        name = f'program_b{b}.jaxexport'
        with open(os.path.join(out_dir, name), 'wb') as f:
            f.write(exp.serialize())
        programs[str(b)] = name
    meta = {
        'format': 'multigriddet_tpu.serving/1',
        'input_hw': list(input_hw),
        'input_dtype': 'uint8',
        'layout': 'NHWC, full canvas; letterbox on host',
        'platforms': list(platforms),
        'programs': programs,
        'class_names': list(class_names or []),
        'outputs': (['candidate_boxes_xywh_canvas', 'candidate_classes',
                     'candidate_scores', 'candidate_valid']
                    if infer_kwargs.get('use_wbf') else
                    ['boxes_xywh_canvas', 'classes', 'scores', 'valid']),
        'params': {k: (list(v) if isinstance(v, (tuple, list)) else v)
                   for k, v in infer_kwargs.items()},
    }
    with open(os.path.join(out_dir, _META), 'w') as f:
        json.dump(meta, f, indent=1)
    return meta


class ServingModel:
    """Loads an exported artifact and serves batches.

    Needs only jax + numpy: ``ServingModel(path)(images_u8)`` →
    (boxes, classes, scores, valid).  Batches smaller than the smallest
    exported program are padded; larger ones are chunked.
    """

    def __init__(self, path: str):
        with open(os.path.join(path, _META)) as f:
            self.meta = json.load(f)
        self.input_hw = tuple(self.meta['input_hw'])
        self.class_names = self.meta['class_names']
        self._fns = {}
        for b, name in sorted(self.meta['programs'].items(),
                              key=lambda kv: int(kv[0])):
            with open(os.path.join(path, name), 'rb') as f:
                exp = jax.export.deserialize(f.read())
            self._fns[int(b)] = jax.jit(exp.call)
        if not self._fns:
            raise ValueError(f'no programs in {path}')
        self.batch_sizes = sorted(self._fns)

    def _run(self, images: np.ndarray):
        n = images.shape[0]
        fit = [b for b in self.batch_sizes if b >= n]
        if fit:  # pad up to the smallest program that fits
            b = fit[0]
            if n < b:
                pad = np.zeros((b - n, *images.shape[1:]), images.dtype)
                images = np.concatenate([images, pad], axis=0)
            outs = self._fns[b](images)
            return tuple(np.asarray(o)[:n] for o in outs)
        # chunk by the largest program
        b = self.batch_sizes[-1]
        chunks = [self._run(images[i:i + b])
                  for i in range(0, n, b)]
        return tuple(np.concatenate(parts, axis=0)
                     for parts in zip(*chunks))

    def __call__(self, images) -> Tuple[np.ndarray, ...]:
        images = np.asarray(images, np.uint8)
        if images.ndim == 3:
            images = images[None]
        expect = (*self.input_hw, 3)
        if images.shape[1:] != expect:
            raise ValueError(
                f'expected [B, {expect[0]}, {expect[1]}, 3] uint8 canvas, '
                f'got {images.shape} (letterbox on host first)')
        return self._run(images)
