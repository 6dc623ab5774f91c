"""Cross-entropy losses (reference: mmdet/models/losses/cross_entropy_loss.py)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...registry import LOSSES


def binary_cross_entropy_with_logits(logits, targets):
    return -(targets * jax.nn.log_sigmoid(logits)
             + (1.0 - targets) * jax.nn.log_sigmoid(-logits))


def softmax_cross_entropy(logits, labels, num_classes, class_weight=None):
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    ce = -(onehot * logp).sum(-1)
    if class_weight is not None:
        cw = jnp.asarray(class_weight, logits.dtype)
        ce = ce * cw[labels]
    return ce


@LOSSES.register_module()
class CrossEntropyLoss:
    def __init__(self, use_sigmoid: bool = False, use_mask: bool = False,
                 reduction: str = 'mean', class_weight=None,
                 loss_weight: float = 1.0):
        self.use_sigmoid = use_sigmoid
        self.use_mask = use_mask
        self.class_weight = class_weight
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        if self.use_sigmoid:
            loss = binary_cross_entropy_with_logits(
                pred, target.astype(pred.dtype))
            if loss.ndim > target.ndim:
                loss = loss.sum(-1)
        else:
            loss = softmax_cross_entropy(
                pred, target, pred.shape[-1], self.class_weight)
        if weight is not None:
            loss = loss * weight
        total = loss.sum()
        if avg_factor is not None:
            total = total / jnp.maximum(avg_factor, 1e-12)
        elif weight is None:
            total = total / max(loss.size, 1)
        return self.loss_weight * total
