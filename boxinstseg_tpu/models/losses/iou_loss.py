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


def _center_dist_terms(pred, target, eps):
    """Shared DIoU/CIoU pieces: IoU, squared center distance rho2 and
    squared enclosing-box diagonal c2 (reference iou_loss.py diou_loss/
    ciou_loss)."""
    iou = aligned_iou(pred, target, mode='iou', eps=eps)
    lt_e = jnp.minimum(pred[..., :2], target[..., :2])
    rb_e = jnp.maximum(pred[..., 2:], target[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0)
    c2 = wh_e[..., 0] ** 2 + wh_e[..., 1] ** 2 + eps
    rho2 = ((target[..., 0] + target[..., 2]
             - pred[..., 0] - pred[..., 2]) ** 2
            + (target[..., 1] + target[..., 3]
               - pred[..., 1] - pred[..., 3]) ** 2) / 4.0
    return iou, rho2, c2


@LOSSES.register_module()
class DIoULoss:
    """Distance-IoU loss (reference iou_loss.py:102-148 diou_loss)."""

    def __init__(self, eps: float = 1e-6, reduction: str = 'mean',
                 loss_weight: float = 1.0):
        self.eps = eps
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        # reference uses the *union*-eps variant: ious = overlap/(union+eps)
        iou, rho2, c2 = _center_dist_terms(pred, target, self.eps)
        loss = 1.0 - (iou - rho2 / c2)
        if weight is not None and weight.ndim > 1:
            weight = weight.mean(axis=-1)
        return self.loss_weight * _reduce(loss, weight, avg_factor)


@LOSSES.register_module()
class CIoULoss:
    """Complete-IoU loss (reference iou_loss.py:151-213 ciou_loss):
    DIoU + aspect-ratio consistency term with detached trade-off alpha
    gated on iou > 0.5."""

    def __init__(self, eps: float = 1e-6, reduction: str = 'mean',
                 loss_weight: float = 1.0):
        self.eps = eps
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        import math

        import jax

        eps = self.eps
        iou, rho2, c2 = _center_dist_terms(pred, target, eps)
        w1 = pred[..., 2] - pred[..., 0]
        h1 = pred[..., 3] - pred[..., 1] + eps
        w2 = target[..., 2] - target[..., 0]
        h2 = target[..., 3] - target[..., 1] + eps
        v = (4.0 / math.pi ** 2) * \
            (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(
            (iou > 0.5).astype(v.dtype) * v / (1.0 - iou + v))
        cious = iou - (rho2 / c2 + alpha * v)
        loss = 1.0 - jnp.clip(cious, -1.0, 1.0)
        if weight is not None and weight.ndim > 1:
            weight = weight.mean(axis=-1)
        return self.loss_weight * _reduce(loss, weight, avg_factor)


@LOSSES.register_module()
class BoundedIoULoss:
    """Fitness-NMS bounded IoU loss (reference iou_loss.py:55-100
    bounded_iou_loss): per-coordinate bounded IoU proxies through a
    smooth-L1 with beta; target center/size treated as constants."""

    def __init__(self, beta: float = 0.2, eps: float = 1e-3,
                 reduction: str = 'mean', loss_weight: float = 1.0):
        self.beta = beta
        self.eps = eps
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        import jax

        eps = self.eps
        pred_ctrx = (pred[..., 0] + pred[..., 2]) * 0.5
        pred_ctry = (pred[..., 1] + pred[..., 3]) * 0.5
        pred_w = pred[..., 2] - pred[..., 0]
        pred_h = pred[..., 3] - pred[..., 1]
        target = jax.lax.stop_gradient(target)
        target_ctrx = (target[..., 0] + target[..., 2]) * 0.5
        target_ctry = (target[..., 1] + target[..., 3]) * 0.5
        target_w = target[..., 2] - target[..., 0]
        target_h = target[..., 3] - target[..., 1]

        dx = jnp.abs(target_ctrx - pred_ctrx)
        dy = jnp.abs(target_ctry - pred_ctry)
        loss_dx = 1 - jnp.maximum(
            (target_w - 2 * dx) / (target_w + 2 * dx + eps), 0.0)
        loss_dy = 1 - jnp.maximum(
            (target_h - 2 * dy) / (target_h + 2 * dy + eps), 0.0)
        loss_dw = 1 - jnp.minimum(target_w / (pred_w + eps),
                                  pred_w / (target_w + eps))
        loss_dh = 1 - jnp.minimum(target_h / (pred_h + eps),
                                  pred_h / (target_h + eps))
        comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
        loss = jnp.where(comb < self.beta,
                         0.5 * comb * comb / self.beta,
                         comb - 0.5 * self.beta)
        return self.loss_weight * _reduce(loss, weight, avg_factor)
