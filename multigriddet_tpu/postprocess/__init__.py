"""Postprocess layer.

The primary decode + NMS path is on-device (``multigriddet_tpu.ops.decode``
/ ``ops.nms``, fused into the jitted forward by
``training.steps.make_infer_step``) — the productionized form of the
capability the reference left dead in gpu_postprocess.py.  This package
holds the host-side extras: Weighted Boxes Fusion and the
reference-API-compatible decoder facade.
"""

from .decoder import MultiGridDecoder
from .wbf import weighted_boxes_fusion

__all__ = ['MultiGridDecoder', 'weighted_boxes_fusion']
