"""Box-IoU assignment + samplers (reference:
mmdet/core/bbox/assigners/max_iou_assigner.py and
mmdet/core/bbox/samplers/{pseudo,random}_sampler.py).

Redesigned for jit: fixed shapes with validity masks instead of torch's
dynamic slicing; the low-quality overwrite loop becomes a vectorized
"largest eligible gt wins" reduction (the reference's ascending-index
loop has exactly that overwrite order, max_iou_assigner.py:199-205).
These are registry-complete pieces — the four shipped methods assign by
FCOS points / SOLO grids / Hungarian matching instead."""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


def bbox_overlaps(b1: jnp.ndarray, b2: jnp.ndarray, mode: str = 'iou',
                  eps: float = 1e-6) -> jnp.ndarray:
    """(n, 4) x (k, 4) xyxy -> (n, k) IoU or IoF (intersection over b1)."""
    lt = jnp.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = jnp.minimum(b1[:, None, 2:4], b2[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    union = a1[:, None] + a2[None, :] - inter if mode == 'iou' \
        else jnp.broadcast_to(a1[:, None], inter.shape)
    return inter / jnp.maximum(union, eps)


def max_iou_assign(bboxes: jnp.ndarray,
                   gt_bboxes: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   pos_iou_thr: float = 0.5,
                   neg_iou_thr: Union[float, Tuple[float, float]] = 0.5,
                   min_pos_iou: float = 0.0,
                   gt_max_assign_all: bool = True,
                   match_low_quality: bool = True,
                   gt_bboxes_ignore: Optional[jnp.ndarray] = None,
                   ignore_valid: Optional[jnp.ndarray] = None,
                   ignore_iof_thr: float = -1.0,
                   gt_labels: Optional[jnp.ndarray] = None):
    """Returns (assigned_gt_inds (n,) int32 with -1 ignore / 0 neg /
    i+1 pos, max_overlaps (n,), assigned_labels (n,) or None).

    gt_bboxes is (k, 4) padded; gt_valid masks real rows.
    """
    overlaps = bbox_overlaps(gt_bboxes, bboxes)          # (k, n)
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)

    if ignore_iof_thr > 0 and gt_bboxes_ignore is not None:
        # reference masks ignored candidates' columns to -1 BEFORE any
        # assignment (max_iou_assigner.py:113-127), so they fall out of
        # neg/pos thresholds AND of gt_max / low-quality matching
        iof = bbox_overlaps(bboxes, gt_bboxes_ignore, mode='iof')
        if ignore_valid is not None:
            iof = jnp.where(ignore_valid[None, :], iof, 0.0)
        overlaps = jnp.where((iof.max(axis=1) > ignore_iof_thr)[None, :],
                             -1.0, overlaps)
    return assign_wrt_overlaps(
        overlaps, gt_valid, pos_iou_thr=pos_iou_thr,
        neg_iou_thr=neg_iou_thr, min_pos_iou=min_pos_iou,
        gt_max_assign_all=gt_max_assign_all,
        match_low_quality=match_low_quality, gt_labels=gt_labels)


def assign_wrt_overlaps(overlaps: jnp.ndarray,
                        gt_valid: jnp.ndarray,
                        pos_iou_thr: float = 0.5,
                        neg_iou_thr: Union[float, Tuple[float, float]] = 0.5,
                        min_pos_iou: float = 0.0,
                        gt_max_assign_all: bool = True,
                        match_low_quality: bool = True,
                        gt_labels: Optional[jnp.ndarray] = None):
    """MaxIoU assignment from a precomputed (k, n) overlap matrix
    (reference max_iou_assigner.py:149-218 assign_wrt_overlaps; also the
    shared tail of ApproxMaxIoUAssigner, approx_max_iou_assigner.py:141).
    Ignored columns must already be -1."""
    n = overlaps.shape[1]

    max_overlaps = overlaps.max(axis=0)
    argmax_overlaps = overlaps.argmax(axis=0)
    gt_max = overlaps.max(axis=1)
    gt_argmax = overlaps.argmax(axis=1)

    assigned = jnp.full((n,), -1, jnp.int32)
    if isinstance(neg_iou_thr, tuple):
        neg = (max_overlaps >= neg_iou_thr[0]) & \
            (max_overlaps < neg_iou_thr[1])
    else:
        neg = (max_overlaps >= 0) & (max_overlaps < neg_iou_thr)
    assigned = jnp.where(neg, 0, assigned)
    pos = max_overlaps >= pos_iou_thr
    assigned = jnp.where(pos, argmax_overlaps.astype(jnp.int32) + 1,
                         assigned)

    if match_low_quality:
        # eligible[g, b]: gt g would claim bbox b in the reference's
        # ascending loop; the largest eligible g wins (later overwrites)
        gt_ok = gt_valid & (gt_max >= min_pos_iou)
        if gt_max_assign_all:
            claim = overlaps == gt_max[:, None]
        else:
            k = overlaps.shape[0]
            claim = jnp.zeros_like(overlaps, bool).at[
                jnp.arange(k), gt_argmax].set(True)
        claim = claim & gt_ok[:, None]
        gid = jnp.arange(overlaps.shape[0], dtype=jnp.int32)
        best = jnp.max(jnp.where(claim, gid[:, None] + 1, 0), axis=0)
        assigned = jnp.where(best > 0, best, assigned)

    labels = None
    if gt_labels is not None:
        labels = jnp.where(
            assigned > 0,
            gt_labels[jnp.clip(assigned - 1, 0, None)].astype(jnp.int32),
            -1)
    return assigned, jnp.maximum(max_overlaps, 0.0), labels


def pseudo_sample(assigned: jnp.ndarray):
    """PseudoSampler: keep every positive/negative as-is (reference:
    mask_pseudo_sampler.py) — returns boolean pos/neg masks."""
    return assigned > 0, assigned == 0


def random_sample(assigned: jnp.ndarray, rng: jax.Array, num: int,
                  pos_fraction: float, neg_pos_ub: float = -1.0):
    """RandomSampler with static output size: boolean masks selecting at
    most num*pos_fraction positives and (num - #pos) negatives uniformly
    (reference: random_sampler.py random_choice). Static-shape variant:
    selection via per-candidate random keys + top-k."""
    n = assigned.shape[0]
    num_pos_max = int(num * pos_fraction)
    kp, kn = jax.random.split(rng)

    def pick(mask, key, limit):
        score = jnp.where(mask, jax.random.uniform(key, (n,)), -1.0)
        thresh_idx = jnp.clip(
            jnp.minimum(limit, jnp.maximum(mask.sum(), 1)) - 1, 0, n - 1)
        kth = jnp.sort(score)[::-1][thresh_idx]
        ok = (mask.sum() > 0) & (limit > 0)
        return mask & (score >= jnp.where(ok, kth, 2.0))

    pos = pick(assigned > 0, kp, num_pos_max)
    num_neg = num - pos.sum()
    if neg_pos_ub >= 0:
        num_neg = jnp.minimum(num_neg,
                              (pos.sum() * neg_pos_ub).astype(jnp.int32))
    neg = pick(assigned == 0, kn, num_neg)
    return pos, neg
