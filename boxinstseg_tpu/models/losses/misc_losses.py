"""Auxiliary loss zoo (reference: mmdet/models/losses/{smooth_l1_loss,
mse_loss,gaussian_focal_loss,varifocal_loss}.py). None of the four
box-supervised methods use these, but they are registered options with
the reference's exact formulas, completing the loss inventory."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...registry import LOSSES


def weight_reduce(loss, weight=None, reduction='mean', avg_factor=None):
    """mmcv weight_reduce_loss semantics (losses/utils.py:30-56)."""
    if weight is not None:
        loss = loss * weight
    if reduction == 'none':
        return loss
    if reduction == 'sum':
        return loss.sum()
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / avg_factor


@LOSSES.register_module()
class L1Loss:
    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        loss = jnp.abs(pred - target)
        return self.loss_weight * weight_reduce(loss, weight,
                                                self.reduction, avg_factor)


@LOSSES.register_module()
class SmoothL1Loss:
    """Huber loss with beta (reference smooth_l1_loss.py:12-31)."""

    def __init__(self, beta=1.0, reduction='mean', loss_weight=1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        diff = jnp.abs(pred - target)
        loss = jnp.where(diff < self.beta,
                         0.5 * diff * diff / self.beta,
                         diff - 0.5 * self.beta)
        return self.loss_weight * weight_reduce(loss, weight,
                                                self.reduction, avg_factor)


@LOSSES.register_module()
class MSELoss:
    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        loss = (pred - target) ** 2
        return self.loss_weight * weight_reduce(loss, weight,
                                                self.reduction, avg_factor)


@LOSSES.register_module()
class GaussianFocalLoss:
    """Focal loss for gaussian heatmaps (reference
    gaussian_focal_loss.py:10-35): positives where target == 1."""

    def __init__(self, alpha=2.0, gamma=4.0, reduction='mean',
                 loss_weight=1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        eps = 1e-12
        pos = (target == 1).astype(pred.dtype)
        neg = (1 - target) ** self.gamma
        loss = -(jnp.log(pred + eps) * (1 - pred) ** self.alpha * pos
                 + jnp.log(1 - pred + eps) * pred ** self.alpha * neg
                 * (1 - pos))
        return self.loss_weight * weight_reduce(loss, weight,
                                                self.reduction, avg_factor)


@LOSSES.register_module()
class VarifocalLoss:
    """IoU-aware classification loss (reference varifocal_loss.py:10-53)."""

    def __init__(self, use_sigmoid=True, alpha=0.75, gamma=2.0,
                 iou_weighted=True, reduction='mean', loss_weight=1.0):
        assert use_sigmoid
        self.alpha = alpha
        self.gamma = gamma
        self.iou_weighted = iou_weighted
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        p = jax.nn.sigmoid(pred)
        ce = jnp.maximum(pred, 0) - pred * target + jnp.log1p(
            jnp.exp(-jnp.abs(pred)))
        pos_mask = (target > 0).astype(pred.dtype)
        if self.iou_weighted:
            focal = target * pos_mask + \
                self.alpha * jnp.abs(p - target) ** self.gamma * \
                (1 - pos_mask)
        else:
            focal = pos_mask + \
                self.alpha * jnp.abs(p - target) ** self.gamma * \
                (1 - pos_mask)
        loss = ce * focal
        return self.loss_weight * weight_reduce(loss, weight,
                                                self.reduction, avg_factor)
