"""Box-projection losses.

``compute_project_term`` is BoxInst's projection dice between the x/y max
projections of mask scores and of the GT box bitmask (reference:
condinst_head.py:134-143). Because a box bitmask's projection is an interval
indicator, callers may pass analytically computed interval targets instead
of materializing per-instance bitmasks.

``BoxProjectionLoss`` is the module form used by BoxLevelset / Box2Mask
(reference: mmdet/models/losses/box_projection_loss.py:6-43).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import LOSSES
from .dice_loss import dice_coefficient


def _masked_dice(x, t, valid, eps=1e-5):
    """Dice over (N, L) with per-instance validity; invalid rows give 0."""
    inter = (x * t).sum(axis=1)
    union = (x ** 2).sum(axis=1) + (t ** 2).sum(axis=1) + eps
    loss = 1.0 - 2.0 * inter / union
    return jnp.where(valid, loss, 0.0)


def compute_project_term(mask_scores: jnp.ndarray, gt_bitmasks: jnp.ndarray,
                         valid=None) -> jnp.ndarray:
    """Projection dice term.

    Args:
      mask_scores: (N, H, W) sigmoid mask scores.
      gt_bitmasks: (N, H, W) box bitmasks.
      valid: optional (N,) bool — padded instances contribute 0 and the mean
        divides by the valid count.
    """
    px = mask_scores.max(axis=1)   # (N, W) projection along y
    tx = gt_bitmasks.max(axis=1)
    py = mask_scores.max(axis=2)   # (N, H) projection along x
    ty = gt_bitmasks.max(axis=2)
    if valid is None:
        lx = dice_coefficient(px, tx)
        ly = dice_coefficient(py, ty)
        return (lx + ly).mean()
    v = valid.astype(mask_scores.dtype)
    lx = _masked_dice(px, tx, valid)
    ly = _masked_dice(py, ty, valid)
    return (lx + ly).sum() / jnp.maximum(v.sum(), 1.0)


@LOSSES.register_module()
class BoxProjectionLoss:
    """x/y max-projection dice between predicted masks and box masks.

    Returns a per-instance (N,) loss vector like the reference module — the
    SOLO-style heads weight and reduce it themselves
    (box_projection_loss.py:14-20).
    """

    def __init__(self, loss_weight: float = 1.0, eps: float = 1e-5):
        self.loss_weight = loss_weight
        self.eps = eps

    def __call__(self, mask_scores, box_bitmasks, valid=None):
        n = mask_scores.shape[0]
        px = mask_scores.reshape(n, mask_scores.shape[-2], -1).max(axis=-2)
        tx = box_bitmasks.reshape(n, box_bitmasks.shape[-2], -1).max(axis=-2)
        py = mask_scores.reshape(n, mask_scores.shape[-2], -1).max(axis=-1)
        ty = box_bitmasks.reshape(n, box_bitmasks.shape[-2], -1).max(axis=-1)
        if valid is None:
            valid = jnp.ones((n,), bool)
        loss = _masked_dice(px, tx, valid, self.eps) + _masked_dice(
            py, ty, valid, self.eps)
        return self.loss_weight * loss
