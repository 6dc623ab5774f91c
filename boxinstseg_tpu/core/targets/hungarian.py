"""Hungarian matching for mask transformers, static shapes.

Reference: MaskHungarianAssigner (mask_hungarian_assigner.py:113-123) —
cost = ClassificationCost + BoxMatchingCost (projection dice,
match_cost.py:365-425), solved per image with scipy on the host (one
device->host sync per decoder layer per step). Here the batched cost matrix
AND the assignment run on device: cost as one einsum, the assignment via
the exact Jonker-Volgenant solver in ``ops/lsa.py`` vmapped over
batch x decoder layers — zero host callbacks in the train graph (the axon
TPU runtime does not support host callbacks at all).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...ops.lsa import solve_lsa

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


def hungarian_match(cost: jnp.ndarray, gt_valid: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cost: (B, Q, G) with arbitrary values in padded columns;
    gt_valid: (B, G). Returns (assigned_query (B, G) int32 zeros-filled,
    valid (B, G)).

    Padded GT rows are given a constant cost so they are indifferent across
    queries: the optimum restricted to valid rows equals the optimum of the
    valid-only problem (they only soak up leftover queries).
    """
    b, q, g = cost.shape
    assert g <= q, (g, q)
    # rows = GTs, cols = queries (rows all get assigned). Rows are sorted
    # valid-first so the solver only augments the LIVE GT count — the
    # augmenting loop is the entire JV cost and capacity (100 padded
    # slots) would otherwise dominate the typical ~7-instance image.
    order = jnp.argsort(~gt_valid, axis=1, stable=True)      # (B, G)
    valid_sorted = jnp.take_along_axis(gt_valid, order, axis=1)
    cost_t = jnp.take_along_axis(
        jnp.swapaxes(cost, 1, 2), order[:, :, None], axis=1)
    cost_t = jax.lax.stop_gradient(
        jnp.where(valid_sorted[:, :, None], cost_t, 0.0))
    n_valid = gt_valid.sum(axis=1).astype(jnp.int32)
    assigned_sorted = jax.vmap(solve_lsa)(cost_t, n_valid)   # (B, G)
    inv = jnp.argsort(order, axis=1)                         # unsort
    assigned = jnp.take_along_axis(assigned_sorted, inv, axis=1)
    return jnp.where(gt_valid, assigned, 0).astype(jnp.int32), gt_valid
