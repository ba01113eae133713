"""Inference layer."""

from .engine import MultiGridInference

__all__ = ['MultiGridInference']
