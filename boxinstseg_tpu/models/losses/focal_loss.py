"""Sigmoid focal loss (reference: mmdet/models/losses/focal_loss.py, which
wraps the mmcv CUDA kernel). Pure XLA — elementwise math fuses into the
surrounding graph, no custom kernel needed."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...registry import LOSSES


def sigmoid_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       num_classes: int, gamma: float = 2.0,
                       alpha: float = 0.25,
                       weight: Optional[jnp.ndarray] = None,
                       avg_factor: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
    """Focal loss over integer labels with background = num_classes.

    Args:
      logits: (..., num_classes). labels: (...,) int, in [0, num_classes];
      num_classes means background (no positive channel).
      weight: optional per-element weight (...,) — use 0 to mask padding.
    Returns scalar (sum / avg_factor) if avg_factor given, else sum.
    """
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = -(onehot * jax.nn.log_sigmoid(logits)
           + (1.0 - onehot) * jax.nn.log_sigmoid(-logits))
    p_t = p * onehot + (1.0 - p) * (1.0 - onehot)
    alpha_t = alpha * onehot + (1.0 - alpha) * (1.0 - onehot)
    loss = alpha_t * ((1.0 - p_t) ** gamma) * ce
    loss = loss.sum(axis=-1)
    if weight is not None:
        loss = loss * weight
    total = loss.sum()
    if avg_factor is not None:
        total = total / jnp.maximum(avg_factor, 1e-12)
    return total


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, use_sigmoid: bool = True, gamma: float = 2.0,
                 alpha: float = 0.25, reduction: str = 'mean',
                 loss_weight: float = 1.0, activated: bool = False):
        assert use_sigmoid, 'only sigmoid focal loss is supported'
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, logits, labels, weight=None, avg_factor=None):
        num_classes = logits.shape[-1]
        return self.loss_weight * sigmoid_focal_loss(
            logits, labels, num_classes, self.gamma, self.alpha,
            weight=weight, avg_factor=avg_factor)
