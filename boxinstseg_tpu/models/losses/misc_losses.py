"""Auxiliary loss zoo (reference: mmdet/models/losses/{smooth_l1_loss,
mse_loss,gaussian_focal_loss,varifocal_loss,balanced_l1_loss,gfocal_loss,
ghm_loss,kd_loss,accuracy}.py). None of the four box-supervised methods
use these, but they are registered options with the reference's exact
formulas, completing the loss inventory."""
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


def _bce_with_logits(pred, target):
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))


@LOSSES.register_module()
class BalancedL1Loss:
    """Libra R-CNN balanced L1 (reference balanced_l1_loss.py:13-52)."""

    def __init__(self, alpha=0.5, gamma=1.5, beta=1.0, reduction='mean',
                 loss_weight=1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        a, g, beta = self.alpha, self.gamma, self.beta
        diff = jnp.abs(pred - target)
        b = jnp.e ** (g / a) - 1
        loss = jnp.where(
            diff < beta,
            a / b * (b * diff + 1) * jnp.log(b * diff / beta + 1)
            - a * diff,
            g * diff + g / b - a * beta)
        return self.loss_weight * weight_reduce(loss, weight,
                                                self.reduction, avg_factor)


@LOSSES.register_module()
class QualityFocalLoss:
    """Generalized Focal Loss QFL (reference gfocal_loss.py:12-53):
    joint cls-quality logits supervised by IoU score at the GT class,
    zero elsewhere."""

    def __init__(self, use_sigmoid=True, beta=2.0, reduction='mean',
                 loss_weight=1.0):
        assert use_sigmoid
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        label, score = target               # (N,), (N,)
        n, c = pred.shape
        p = jax.nn.sigmoid(pred)
        # negatives: 0-quality target on every channel
        loss = _bce_with_logits(pred, jnp.zeros_like(pred)) * \
            p ** self.beta
        # positives: quality target on the GT channel
        pos = (label >= 0) & (label < c)
        onehot = jax.nn.one_hot(jnp.where(pos, label, c), c,
                                dtype=pred.dtype)
        sf = jnp.abs(score[:, None] - p) ** self.beta
        pos_loss = _bce_with_logits(pred, score[:, None] *
                                    jnp.ones_like(pred)) * sf
        loss = jnp.where(onehot > 0, pos_loss, loss).sum(axis=1)
        return self.loss_weight * weight_reduce(loss, weight,
                                                self.reduction, avg_factor)


@LOSSES.register_module()
class DistributionFocalLoss:
    """Generalized Focal Loss DFL (reference gfocal_loss.py:103-125):
    cross-entropy on the two integral bins around the continuous
    distance label, linearly weighted."""

    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, label, weight=None, avg_factor=None):
        left = label.astype(jnp.int32)
        right = left + 1
        wl = right.astype(pred.dtype) - label
        wr = label - left.astype(pred.dtype)
        logp = jax.nn.log_softmax(pred, axis=-1)
        ce_l = -jnp.take_along_axis(logp, left[:, None], axis=1)[:, 0]
        ce_r = -jnp.take_along_axis(
            logp, jnp.clip(right, 0, pred.shape[-1] - 1)[:, None],
            axis=1)[:, 0]
        loss = ce_l * wl + ce_r * wr
        return self.loss_weight * weight_reduce(loss, weight,
                                                self.reduction, avg_factor)


@LOSSES.register_module()
class KnowledgeDistillationKLDivLoss:
    """Temperature-scaled KL distillation (reference kd_loss.py:12-37)."""

    def __init__(self, reduction='mean', loss_weight=1.0, T=10):
        self.T = T
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, soft_label, weight=None, avg_factor=None):
        t = jax.nn.softmax(jax.lax.stop_gradient(soft_label) / self.T,
                           axis=1)
        logp = jax.nn.log_softmax(pred / self.T, axis=1)
        # F.kl_div(logp, t) = t * (log t - logp); 0 * log 0 -> 0
        kl = t * (jnp.log(jnp.clip(t, 1e-30, None)) - logp)
        loss = kl.mean(axis=1) * (self.T * self.T)
        return self.loss_weight * weight_reduce(loss, weight,
                                                self.reduction, avg_factor)


def _ghm_weights(g, valid, bins, eps=1e-6):
    """Gradient-density weights shared by GHMC/GHMR (reference
    ghm_loss.py:95-111, 196-210): tot / count(bin), normalized by the
    number of non-empty bins. Traced (no .item()): histogram by
    searchsorted-style bucketing."""
    idx = jnp.clip((g * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros((bins,), jnp.float32).at[idx].add(
        valid.astype(jnp.float32).reshape(g.shape))
    tot = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    n = jnp.maximum((counts > 0).sum().astype(jnp.float32), 1.0)
    w = jnp.where(counts > 0, tot / jnp.maximum(counts, eps), 0.0)
    return jnp.where(valid.reshape(g.shape), w[idx], 0.0) / n, tot


@LOSSES.register_module()
class GHMC:
    """GHM classification loss (reference ghm_loss.py:23-119), the
    stateless momentum=0 form (the running acc_sum buffer is a training
    heuristic off by default)."""

    def __init__(self, bins=10, momentum=0, use_sigmoid=True,
                 loss_weight=1.0, reduction='mean'):
        assert use_sigmoid and momentum == 0
        self.bins = bins
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, label_weight, avg_factor=None):
        target = target.astype(pred.dtype)
        valid = label_weight > 0
        g = jnp.abs(jax.lax.stop_gradient(jax.nn.sigmoid(pred)) - target)
        weights, tot = _ghm_weights(g, valid, self.bins)
        loss = _bce_with_logits(pred, target)
        return self.loss_weight * weight_reduce(loss, weights,
                                                self.reduction, tot)


@LOSSES.register_module()
class GHMR:
    """GHM regression loss with the authentic-smooth-L1 base
    (reference ghm_loss.py:122-232), stateless momentum=0 form."""

    def __init__(self, mu=0.02, bins=10, momentum=0, loss_weight=1.0,
                 reduction='mean'):
        assert momentum == 0
        self.mu = mu
        self.bins = bins
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, label_weight, avg_factor=None):
        mu = self.mu
        diff = pred - target
        loss = jnp.sqrt(diff * diff + mu * mu) - mu
        g = jax.lax.stop_gradient(
            jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff)))
        valid = label_weight > 0
        weights, tot = _ghm_weights(g, valid, self.bins)
        return self.loss_weight * weight_reduce(loss, weights,
                                                self.reduction, tot)


class Accuracy:
    """Module-style wrapper over :func:`accuracy` (reference
    accuracy.py:54-78)."""

    def __init__(self, topk=(1, ), thresh=None):
        self.topk = topk
        self.thresh = thresh

    def __call__(self, pred, target):
        return accuracy(pred, target, self.topk, self.thresh)


def accuracy(pred, target, topk=1, thresh=None):
    """Top-k accuracy in percent (reference accuracy.py:7-51)."""
    ks = (topk,) if isinstance(topk, int) else tuple(topk)
    maxk = max(ks)
    if pred.shape[0] == 0:
        accu = [jnp.zeros(()) for _ in ks]
        return accu[0] if isinstance(topk, int) else accu
    _, pred_label = jax.lax.top_k(pred, maxk)             # (N, maxk)
    correct = pred_label == target[:, None]
    if thresh is not None:
        pred_val = jnp.take_along_axis(pred, pred_label, axis=1)
        correct = correct & (pred_val > thresh)
    res = []
    for k in ks:
        res.append(correct[:, :k].sum() * 100.0 / pred.shape[0])
    return res[0] if isinstance(topk, int) else res
