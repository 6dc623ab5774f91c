"""IoU-family box losses (reference: mmdet/models/losses/iou_loss.py)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...ops.boxes import aligned_iou
from ...registry import LOSSES


def _reduce(loss, weight, avg_factor):
    if weight is not None:
        loss = loss * weight
    total = loss.sum()
    if avg_factor is not None:
        total = total / jnp.maximum(avg_factor, 1e-12)
    return total


@LOSSES.register_module()
class IoULoss:
    def __init__(self, linear: bool = False, eps: float = 1e-6,
                 reduction: str = 'mean', loss_weight: float = 1.0,
                 mode: str = 'log'):
        self.eps = eps
        self.loss_weight = loss_weight
        self.mode = 'linear' if linear else mode

    def __call__(self, pred, target, weight=None, avg_factor=None):
        iou = aligned_iou(pred, target, mode='iou', eps=self.eps)
        if self.mode == 'linear':
            loss = 1.0 - iou
        elif self.mode == 'square':
            loss = 1.0 - iou ** 2
        else:
            loss = -jnp.log(jnp.maximum(iou, self.eps))
        return self.loss_weight * _reduce(loss, weight, avg_factor)


@LOSSES.register_module()
class GIoULoss:
    def __init__(self, eps: float = 1e-7, reduction: str = 'mean',
                 loss_weight: float = 1.0):
        self.eps = eps
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        giou = aligned_iou(pred, target, mode='giou', eps=self.eps)
        loss = 1.0 - giou
        return self.loss_weight * _reduce(loss, weight, avg_factor)
