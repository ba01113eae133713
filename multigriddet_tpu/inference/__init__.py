"""Inference layer."""

from .engine import MultiGridInference
from .export import ServingModel, export_serving

__all__ = ['MultiGridInference', 'ServingModel', 'export_serving']
