"""Hungarian matching for mask transformers, static shapes.

Reference: MaskHungarianAssigner (mask_hungarian_assigner.py:113-123) —
cost = ClassificationCost + BoxMatchingCost (projection dice,
match_cost.py:365-425), solved per image with scipy on the host. Here the
batched cost matrix is computed on device (padded GT slots get +inf cost)
and the assignment itself — a discrete O(n^3) routine with data-dependent
control flow — runs through one pure_callback to scipy's
linear_sum_assignment, returning a fixed-shape (G,) query index per GT.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BIG_COST = 1e8


def classification_cost(cls_scores: jnp.ndarray, gt_labels: jnp.ndarray
                        ) -> jnp.ndarray:
    """-softmax prob of the GT class. cls_scores: (B, Q, C+1);
    gt_labels: (B, G). Returns (B, Q, G)."""
    probs = jax.nn.softmax(cls_scores, axis=-1)
    return -jnp.take_along_axis(
        probs, gt_labels[:, None, :], axis=-1)


def box_matching_cost(mask_preds: jnp.ndarray, gt_box_masks: jnp.ndarray,
                      eps: float = 1.0) -> jnp.ndarray:
    """x/y projected 1-D dice cost (reference BoxMatchingCost with
    pred_act=True, eps=1.0). mask_preds: (B, Q, H, W) logits;
    gt_box_masks: (B, G, H, W). Returns (B, Q, G)."""
    p = jax.nn.sigmoid(mask_preds)
    t = gt_box_masks.astype(p.dtype)

    def proj_dice(pp, tt):   # (B, Q, L), (B, G, L)
        num = 2 * jnp.einsum('bql,bgl->bqg', pp, tt,
                             preferred_element_type=jnp.float32)
        den = (pp ** 2).sum(-1)[:, :, None] + (tt ** 2).sum(-1)[:, None, :]
        return 1.0 - (num + eps) / (den + eps)

    cx = proj_dice(p.max(axis=2), t.max(axis=2))   # project onto x
    cy = proj_dice(p.max(axis=3), t.max(axis=3))
    return cx + cy


def _lsa_host(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Batched linear_sum_assignment. cost: (B, Q, G); n_valid: (B,).
    Returns (B, G) assigned query per GT (-1 for padded slots)."""
    from scipy.optimize import linear_sum_assignment
    b, q, g = cost.shape
    out = -np.ones((b, g), np.int32)
    for i in range(b):
        n = int(n_valid[i])
        if n == 0:
            continue
        rows, cols = linear_sum_assignment(cost[i, :, :n])
        out[i, cols] = rows.astype(np.int32)
    return out


def hungarian_match(cost: jnp.ndarray, gt_valid: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cost: (B, Q, G) with arbitrary values in padded columns;
    gt_valid: (B, G). Returns (assigned_query (B, G) int32 zeros-filled,
    valid (B, G))."""
    cost = jax.lax.stop_gradient(
        jnp.where(gt_valid[:, None, :], cost, BIG_COST))
    n_valid = gt_valid.sum(axis=1).astype(jnp.int32)
    b, q, g = cost.shape
    # padded GT columns must sort after valid ones for the host trim:
    # reorder so valid slots are contiguous
    order = jnp.argsort(~gt_valid, axis=1, stable=True)       # valid first
    cost_sorted = jnp.take_along_axis(cost, order[:, None, :], axis=2)
    assigned_sorted = jax.pure_callback(
        _lsa_host, jax.ShapeDtypeStruct((b, g), jnp.int32),
        cost_sorted, n_valid)
    # scatter back to original GT slots
    inv = jnp.argsort(order, axis=1)
    assigned = jnp.take_along_axis(assigned_sorted, inv, axis=1)
    valid = gt_valid & (assigned >= 0)
    return jnp.where(valid, assigned, 0).astype(jnp.int32), valid
