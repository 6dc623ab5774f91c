"""Static-shape NMS ops.

- ``greedy_nms``: exact class-aware hard NMS as a fixed-iteration lax loop
  (replaces mmcv's CUDA batched_nms; reference consumer:
  condinst_head.py:18-83 ``nms_with_others``). All shapes static: the caller
  pre-selects a fixed candidate count and gets back a fixed number of kept
  slots plus a validity mask.
- ``mask_matrix_nms``: SOLO-style soft suppression — already pure matmul
  math in the reference (mmdet/core/post_processing/matrix_nms.py:5-121),
  re-derived here for padded fixed-size inputs.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps


def greedy_nms(boxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray,
               iou_thr: float, max_det: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy hard NMS with per-class separation.

    Args:
      boxes: (P, 4) xyxy. scores: (P,) — candidates with score<=0 are
      treated as invalid. labels: (P,) int32.
    Returns:
      keep_idx: (max_det,) indices into the input arrays (0 for unused
        slots) and keep_valid: (max_det,) bool.
    """
    p = boxes.shape[0]
    # IoU is only suppressive within the same class.
    iou = bbox_overlaps(boxes, boxes)
    same_cls = labels[:, None] == labels[None, :]
    suppress_mat = (iou > iou_thr) & same_cls  # (P, P)

    def body(_, state):
        alive_scores, keep_idx, keep_valid, n = state
        best = jnp.argmax(alive_scores)
        best_score = alive_scores[best]
        valid = best_score > 0.0
        keep_idx = keep_idx.at[n].set(jnp.where(valid, best, 0))
        keep_valid = keep_valid.at[n].set(valid)
        # Kill the chosen box and everything it suppresses.
        kill = suppress_mat[best] | (jnp.arange(p) == best)
        alive_scores = jnp.where(valid & kill, -1.0, alive_scores)
        return alive_scores, keep_idx, keep_valid, n + jnp.int32(valid)

    init = (jnp.where(scores > 0, scores, -1.0),
            jnp.zeros((max_det,), jnp.int32),
            jnp.zeros((max_det,), bool),
            jnp.int32(0))
    _, keep_idx, keep_valid, _ = jax.lax.fori_loop(0, max_det, body, init)
    return keep_idx, keep_valid


def mask_matrix_nms(masks: jnp.ndarray, labels: jnp.ndarray,
                    scores: jnp.ndarray, valid: jnp.ndarray,
                    kernel: str = 'gaussian', sigma: float = 2.0
                    ) -> jnp.ndarray:
    """Matrix NMS over binarized masks; returns decayed scores.

    Args:
      masks: (N, H, W) float binary masks (already thresholded), padded rows
        allowed. labels: (N,). scores: (N,) sorted descending by the caller
        or not — sorting is handled internally. valid: (N,) bool.
    Returns:
      (N,) updated scores (invalid rows get 0). Order of rows is preserved.
    """
    n = masks.shape[0]
    scores = jnp.where(valid, scores, 0.0)
    order = jnp.argsort(-scores)  # descending
    rank = jnp.argsort(order)     # position of each row in sorted order

    flat = masks.reshape(n, -1)
    flat_sorted = flat[order]
    areas = flat_sorted.sum(axis=1)
    inter = flat_sorted @ flat_sorted.T
    union = areas[:, None] + areas[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-6)

    labels_sorted = labels[order]
    valid_sorted = valid[order]
    same = (labels_sorted[:, None] == labels_sorted[None, :])
    same = same & valid_sorted[:, None] & valid_sorted[None, :]
    # upper triangle: j suppressed by i where i ranked above j
    tri = jnp.triu(jnp.ones((n, n), bool), k=1)
    iou_m = jnp.where(same & tri, iou, 0.0)

    # IoU compensation: the largest IoU each suppressor i itself suffered
    # from higher-ranked same-class masks; broadcast along i's row.
    compensate_i = jnp.max(iou_m, axis=0)        # (n,) per column
    comp = compensate_i[:, None]                 # row i = compensate of i

    if kernel == 'gaussian':
        decay = jnp.exp(-sigma * (iou_m ** 2 - comp ** 2))
    elif kernel == 'linear':
        decay = (1.0 - iou_m) / jnp.maximum(1.0 - comp, 1e-6)
    else:
        raise ValueError(kernel)
    decay_factor = jnp.min(decay, axis=0)        # per column (suppressee)

    new_sorted = scores[order] * decay_factor
    return jnp.where(valid, new_sorted[rank], 0.0)


def points_nms_2x2(heat: jnp.ndarray) -> jnp.ndarray:
    """SOLO 'points NMS': keep a score only if it is the max of its 2x2
    neighborhood (reference: box_solov2_head.py points_nms via max_pool)."""
    # heat: (..., H, W)
    pad = [(0, 0)] * (heat.ndim - 2) + [(1, 0), (1, 0)]
    hp = jnp.pad(heat, pad, constant_values=-jnp.inf)
    m = jnp.maximum(
        jnp.maximum(hp[..., :-1, :-1], hp[..., :-1, 1:]),
        jnp.maximum(hp[..., 1:, :-1], hp[..., 1:, 1:]))
    return jnp.where(heat >= m, heat, 0.0)
