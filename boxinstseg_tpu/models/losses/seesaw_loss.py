"""Seesaw loss for long-tailed classification (reference:
mmdet/models/losses/seesaw_loss.py — seesaw_ce_loss :12-78, SeesawLoss
:81-262).

TPU-native redesign: the reference keeps a ``cum_samples`` running
buffer inside the module and indexes positive rows dynamically; here the
buffer is explicit functional state (carry it in your TrainState and
thread it through the loss), and the positive subset is handled with
masks so everything stays static-shape under jit.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...registry import LOSSES
from .misc_losses import weight_reduce


def seesaw_ce_loss(cls_score: jnp.ndarray,
                   labels: jnp.ndarray,
                   label_weights: Optional[jnp.ndarray],
                   cum_samples: jnp.ndarray,
                   num_classes: int,
                   p: float,
                   q: float,
                   eps: float,
                   reduction: str = 'mean',
                   avg_factor=None,
                   valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-reference seesaw cross-entropy over rows flagged by ``valid``
    (all rows if None). ``reduction='mean'`` averages over valid rows,
    matching the reference's boolean-indexed subset mean."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=cls_score.dtype)
    seesaw = jnp.ones_like(cls_score)

    if p > 0:
        cs = jnp.maximum(cum_samples, 1.0)
        ratio = cs[None, :] / cs[:, None]                  # (C, C)
        sample_w = jnp.where(ratio < 1.0, ratio ** p, 1.0)
        seesaw = seesaw * sample_w[jnp.clip(labels, 0, num_classes - 1)]

    if q > 0:
        scores = jax.nn.softmax(jax.lax.stop_gradient(cls_score), axis=1)
        self_scores = jnp.take_along_axis(
            scores, jnp.clip(labels, 0, num_classes - 1)[:, None],
            axis=1)[:, 0]
        score_mat = scores / jnp.maximum(self_scores, eps)[:, None]
        comp = jnp.where(score_mat > 1.0, score_mat ** q, 1.0)
        seesaw = seesaw * comp

    logits = cls_score + jnp.log(seesaw) * (1.0 - onehot)
    logp = jax.nn.log_softmax(logits, axis=1)
    loss = -jnp.take_along_axis(
        logp, jnp.clip(labels, 0, num_classes - 1)[:, None], axis=1)[:, 0]

    if label_weights is not None:
        loss = loss * label_weights.astype(loss.dtype)
    if valid is not None:
        loss = jnp.where(valid, loss, 0.0)
        if reduction == 'mean' and avg_factor is None:
            return loss.sum() / jnp.maximum(
                valid.sum().astype(loss.dtype), 1.0)
    return weight_reduce(loss, None, reduction, avg_factor)


@LOSSES.register_module()
class SeesawLoss:
    """Softmax seesaw loss with the reference's (C+2)-channel layout:
    C class logits + 2 objectness logits (reference seesaw_loss.py:
    `_split_cls_score` :141-146, forward :201-262).

    Functional state: ``init_cum_samples()`` builds the (C+1,) counter;
    ``update_cum_samples(cum, labels)`` is the buffer accumulation the
    reference does in-place at forward :230-233.
    """

    def __init__(self, use_sigmoid: bool = False, p: float = 0.8,
                 q: float = 2.0, num_classes: int = 1203, eps: float = 1e-2,
                 reduction: str = 'mean', loss_weight: float = 1.0,
                 return_dict: bool = True):
        assert not use_sigmoid, 'SeesawLoss is softmax-only (reference)'
        self.p = p
        self.q = q
        self.num_classes = num_classes
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.return_dict = return_dict

    # --- functional replacements for the reference's registered buffer ---
    def init_cum_samples(self) -> jnp.ndarray:
        return jnp.zeros((self.num_classes + 1,), jnp.float32)

    def update_cum_samples(self, cum_samples: jnp.ndarray,
                           labels: jnp.ndarray,
                           valid: Optional[jnp.ndarray] = None):
        add = jnp.ones(labels.shape, jnp.float32) if valid is None \
            else valid.astype(jnp.float32)
        return cum_samples.at[
            jnp.clip(labels, 0, self.num_classes)].add(add)

    # --- custom-classifier hooks (reference :148-198) ---
    def get_cls_channels(self, num_classes: int) -> int:
        assert num_classes == self.num_classes
        return num_classes + 2

    def get_activation(self, cls_score: jnp.ndarray) -> jnp.ndarray:
        cls_c, cls_o = cls_score[..., :-2], cls_score[..., -2:]
        score_c = jax.nn.softmax(cls_c, axis=-1)
        score_o = jax.nn.softmax(cls_o, axis=-1)
        return jnp.concatenate(
            [score_c * score_o[..., :1], score_o[..., 1:]], axis=-1)

    def __call__(self, cls_score, labels, cum_samples, label_weights=None,
                 avg_factor=None, reduction_override=None):
        reduction = reduction_override or self.reduction
        num_classes = self.num_classes
        assert cls_score.shape[-1] == num_classes + 2
        pos = labels < num_classes
        obj_labels = (labels == num_classes).astype(jnp.int32)

        if label_weights is None:
            label_weights = jnp.ones(labels.shape, cls_score.dtype)
        label_weights = label_weights.astype(cls_score.dtype)

        cls_c, cls_o = cls_score[..., :-2], cls_score[..., -2:]
        loss_classes = self.loss_weight * seesaw_ce_loss(
            cls_c, labels, label_weights, cum_samples[:num_classes],
            num_classes, self.p, self.q, self.eps, reduction, avg_factor,
            valid=pos)
        # objectness: plain softmax CE over every sample
        logp_o = jax.nn.log_softmax(cls_o, axis=1)
        ce_o = -jnp.take_along_axis(logp_o, obj_labels[:, None],
                                    axis=1)[:, 0]
        loss_objectness = self.loss_weight * weight_reduce(
            ce_o, label_weights, reduction, avg_factor)

        if self.return_dict:
            return dict(loss_cls_objectness=loss_objectness,
                        loss_cls_classes=loss_classes)
        return loss_classes + loss_objectness
