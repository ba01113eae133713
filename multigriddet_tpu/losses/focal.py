"""Focal losses (sigmoid and softmax), pure JAX.

TPU-native equivalents of /root/reference/multigriddet/losses/focal_loss.py
(SigmoidFocalLoss:40-77, SoftmaxFocalLoss:80+): standard Lin et al. focal
formulation with alpha=0.25, gamma=2.0 defaults, computed from logits for
numerical stability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_cross_entropy_with_logits(labels: jnp.ndarray,
                                     logits: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCE from logits: max(x,0) - x*z + log(1+exp(-|x|))."""
    return (jnp.maximum(logits, 0.0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def sigmoid_focal_loss(labels: jnp.ndarray, logits: jnp.ndarray,
                       alpha: float = 0.25,
                       gamma: float = 2.0) -> jnp.ndarray:
    """Per-element sigmoid focal loss (no reduction)."""
    p = jax.nn.sigmoid(logits)
    bce = binary_cross_entropy_with_logits(labels, logits)
    p_t = labels * p + (1.0 - labels) * (1.0 - p)
    alpha_t = labels * alpha + (1.0 - labels) * (1.0 - alpha)
    return alpha_t * jnp.power(1.0 - p_t, gamma) * bce


def softmax_focal_loss(labels: jnp.ndarray, logits: jnp.ndarray,
                       alpha: float = 0.25,
                       gamma: float = 2.0) -> jnp.ndarray:
    """Per-class softmax focal loss (no reduction over the class axis)."""
    log_p = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(log_p)
    ce = -labels * log_p
    return alpha * jnp.power(1.0 - p, gamma) * ce
