"""The reference box-sampler zoo, TPU-native (reference:
mmdet/core/bbox/samplers/{instance_balanced_pos,iou_balanced_neg,ohem,
score_hlr,combined}_sampler.py).

The reference samplers build dynamic index lists with numpy/set
operations on the host; here every sampler returns fixed-shape boolean
masks (and per-sample weights where the reference produces them), with
randomized top-k selection replacing ``random_choice`` so everything
traces under jit. The four shipped methods don't sample boxes (they use
pseudo-sampling / dense assignment); these complete the registry.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.boxes import aligned_iou


def _rand_topk_mask(mask: jnp.ndarray, key: jax.Array,
                    limit) -> jnp.ndarray:
    """Uniformly keep at most ``limit`` True entries of ``mask``."""
    n = mask.shape[0]
    score = jnp.where(mask, jax.random.uniform(key, (n,)), -1.0)
    order = jnp.argsort(-score)
    ranks = jnp.argsort(order)
    return mask & (ranks < limit)


def instance_balanced_pos_sample(assigned: jnp.ndarray, rng: jax.Array,
                                 num_expected: int,
                                 max_gts: Optional[int] = None
                                 ) -> jnp.ndarray:
    """InstanceBalancedPosSampler (reference
    instance_balanced_pos_sampler.py:20-55): cap each GT's positives at
    round(num_expected / num_gts) + 1, then top up randomly from the
    remaining positives."""
    pos = assigned > 0
    n = assigned.shape[0]
    k1, k2 = jax.random.split(rng)
    num_pos = pos.sum()

    if max_gts is None:
        max_gts = n
    # unique positive gt count
    gt_ids = jnp.where(pos, assigned, 0)
    counts = jnp.zeros((max_gts + 1,), jnp.int32).at[
        jnp.clip(gt_ids, 0, max_gts)].add(pos.astype(jnp.int32))
    num_gts = jnp.maximum((counts[1:] > 0).sum(), 1)
    per_gt = (jnp.round(num_expected / num_gts.astype(jnp.float32))
              .astype(jnp.int32) + 1)

    # random rank within each gt group
    u = jax.random.uniform(k1, (n,))
    key_sort = jnp.where(pos, gt_ids.astype(jnp.float32) * 2.0 + u, 1e9)
    order = jnp.argsort(key_sort)
    sg = gt_ids[order]
    posidx = jnp.arange(n)
    start = jnp.concatenate([jnp.array([True]), sg[1:] != sg[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(start, posidx, -1))
    rank_in_group = jnp.zeros((n,), jnp.int32).at[order].set(
        (posidx - seg_start).astype(jnp.int32))
    keep = pos & (rank_in_group < per_gt)

    # top up / trim to num_expected
    short = num_expected - keep.sum()
    extra = _rand_topk_mask(pos & ~keep, k2, jnp.maximum(short, 0))
    keep = keep | extra
    keep = _rand_topk_mask(keep, jax.random.fold_in(k2, 1),
                           jnp.minimum(num_expected, num_pos))
    return jnp.where(num_pos <= num_expected, pos, keep)


def iou_balanced_neg_sample(assigned: jnp.ndarray,
                            max_overlaps: jnp.ndarray,
                            rng: jax.Array,
                            num_expected: int,
                            floor_thr: float = -1.0,
                            floor_fraction: float = 0.0,
                            num_bins: int = 3) -> jnp.ndarray:
    """IoUBalancedNegSampler (reference iou_balanced_neg_sampler.py:
    25-157): negatives are binned by their max IoU and sampled evenly per
    bin (floor region sampled separately), topped up randomly."""
    neg = assigned == 0
    n = assigned.shape[0]
    keys = jax.random.split(rng, num_bins + 3)
    num_neg = neg.sum()

    if floor_thr > 0:
        floor = neg & (max_overlaps >= 0) & (max_overlaps < floor_thr)
        iou_set = neg & (max_overlaps >= floor_thr)
        ft = floor_thr
    elif floor_thr == 0:
        floor = neg & (max_overlaps == 0)
        iou_set = neg & (max_overlaps > 0)
        ft = 0.0
    else:
        floor = jnp.zeros((n,), bool)
        iou_set = neg
        ft = 0.0

    num_iou_exp = int(num_expected * (1 - floor_fraction))
    max_iou = max_overlaps.max()
    interval = (max_iou - ft) / num_bins
    per_bin = num_iou_exp // num_bins

    picked = jnp.zeros((n,), bool)
    for i in range(num_bins):
        lo = ft + i * interval
        hi = ft + (i + 1) * interval
        in_bin = iou_set & (max_overlaps >= lo) & (max_overlaps < hi)
        picked = picked | _rand_topk_mask(in_bin, keys[i], per_bin)
    # floor quota = what's left after the iou bins
    num_floor = num_expected - picked.sum()
    picked = picked | _rand_topk_mask(floor, keys[num_bins],
                                      jnp.maximum(num_floor, 0))
    # final top-up from any remaining negatives
    short = num_expected - picked.sum()
    picked = picked | _rand_topk_mask(neg & ~picked, keys[num_bins + 1],
                                      jnp.maximum(short, 0))
    return jnp.where(num_neg <= num_expected, neg, picked)


def ohem_sample(assigned: jnp.ndarray, loss: jnp.ndarray, num: int,
                pos_fraction: float,
                neg_pos_ub: float = -1.0
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """OHEMSampler (reference ohem_sampler.py:40-110): keep the
    highest-loss positives/negatives ("hard mining" via the head's own
    per-sample loss, which the caller supplies)."""
    num_pos_max = int(num * pos_fraction)

    def hard(mask, limit):
        s = jnp.where(mask, loss, -jnp.inf)
        order = jnp.argsort(-s)
        ranks = jnp.argsort(order)
        return mask & (ranks < limit)

    pos = hard(assigned > 0, num_pos_max)
    num_neg = num - pos.sum()
    if neg_pos_ub >= 0:
        num_neg = jnp.minimum(
            num_neg, (pos.sum() * neg_pos_ub).astype(jnp.int32))
    neg = hard(assigned == 0, num_neg)
    return pos, neg


def nms_match_groups(boxes: jnp.ndarray, scores: jnp.ndarray,
                     valid: jnp.ndarray, iou_thr: float) -> jnp.ndarray:
    """mmcv ``nms_match`` as group ids: each box belongs to the first
    (highest-score) greedy-NMS survivor that overlaps it > iou_thr;
    survivors lead their own groups. Returns (n,) int32 group ids
    (= index of the group seed), -1 for invalid boxes."""
    n = boxes.shape[0]
    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf))
    b = boxes[order]
    ious = aligned_iou(b[:, None, :].repeat(n, 1),
                       b[None, :, :].repeat(n, 0))
    v = valid[order]

    def body(i, carry):
        keep, seed = carry
        # box i is suppressed by the first kept j < i with IoU > thr
        sup = (jnp.arange(n) < i) & keep & (ious[i] > iou_thr) & v
        has = sup.any()
        j = jnp.argmax(sup)                # first True
        keep = keep.at[i].set(v[i] & ~has)
        seed = seed.at[i].set(jnp.where(has, seed[j], i))
        return keep, seed

    keep0 = jnp.zeros((n,), bool)
    seed0 = jnp.full((n,), -1, jnp.int32)
    _, seed_sorted = jax.lax.fori_loop(0, n, body, (keep0, seed0))
    # map back to original indexing
    group = jnp.full((n,), -1, jnp.int32)
    group = group.at[order].set(
        jnp.where(v, order[jnp.clip(seed_sorted, 0, None)], -1)
        .astype(jnp.int32))
    return group


def score_hlr_neg_sample(assigned: jnp.ndarray,
                         max_score: jnp.ndarray,
                         pred_boxes: jnp.ndarray,
                         rng: jax.Array,
                         num_expected: int,
                         score_thr: float = 0.05,
                         iou_thr: float = 0.5,
                         k: float = 0.5,
                         bias: float = 0.0,
                         ori_loss: Optional[jnp.ndarray] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ScoreHLRSampler negatives (reference score_hlr_sampler.py:101-215):
    valid (score > thr) negatives are grouped by NMS-match on their
    decoded boxes, double-ranked (in-group by score, then globally) into
    Score-HLR, the hardest kept, the rest filled from invalid negatives;
    label weights linearly map the HLR and renormalize against
    ``ori_loss``. Returns (selected mask, (n,) label weights)."""
    neg = assigned == 0
    n = assigned.shape[0]
    k1, k2 = jax.random.split(rng)

    valid = neg & (max_score > score_thr)
    invalid = neg & ~valid
    num_valid = valid.sum()

    group = nms_match_groups(pred_boxes, max_score, valid, iou_thr)
    # in-group rank by score desc (group seeds have the highest score)
    gkey = jnp.where(valid, group.astype(jnp.float32), jnp.inf)
    order = jnp.lexsort((-max_score, gkey))
    sg = group[order]
    posidx = jnp.arange(n)
    start = jnp.concatenate([jnp.array([True]), sg[1:] != sg[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(start, posidx, -1))
    rank_in_group = jnp.zeros((n,), jnp.float32).at[order].set(
        (posidx - seg_start).astype(jnp.float32))

    imp = jnp.where(valid,
                    num_valid.astype(jnp.float32) - rank_in_group
                    + max_score, -jnp.inf)
    imp_order = jnp.argsort(-imp)
    imp_rank = jnp.argsort(imp_order).astype(jnp.float32)   # 0 = hardest

    hlr_keep = valid & (imp_rank < num_expected)
    num_hlr = hlr_keep.sum()
    rand_fill = _rand_topk_mask(invalid, k1,
                                jnp.maximum(num_expected - num_hlr, 0))
    select = hlr_keep | rand_fill

    up_bound = jnp.maximum(jnp.float32(num_expected), num_valid
                           .astype(jnp.float32))
    w_hlr = (up_bound - imp_rank) / up_bound
    min_w = jnp.where(num_valid > 0,
                      jnp.min(jnp.where(hlr_keep, w_hlr, jnp.inf)), 1.0)
    weights = jnp.where(hlr_keep, w_hlr,
                        jnp.where(rand_fill, min_w, 0.0))
    weights = jnp.where(select,
                        (bias + (1 - bias) * weights) ** k, 0.0)
    if ori_loss is not None:
        ori = (ori_loss * select).sum()
        new = (ori_loss * weights).sum()
        weights = weights * ori / jnp.maximum(new, 1e-12)
    # degenerate case: no valid negatives -> uniform weights, random pick
    fallback = _rand_topk_mask(neg, k2, num_expected)
    weights = jnp.where(num_valid > 0, weights,
                        fallback.astype(jnp.float32))
    select = jnp.where(num_valid > 0, select, fallback)
    return select, weights


def combined_sample(assigned: jnp.ndarray, max_overlaps: jnp.ndarray,
                    rng: jax.Array, num: int, pos_fraction: float,
                    floor_thr: float = -1.0, floor_fraction: float = 0.0,
                    num_bins: int = 3
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CombinedSampler as shipped in Libra R-CNN configs
    (reference combined_sampler.py: InstanceBalancedPosSampler +
    IoUBalancedNegSampler)."""
    kp, kn = jax.random.split(rng)
    pos = instance_balanced_pos_sample(assigned, kp,
                                       int(num * pos_fraction))
    num_neg = num - pos.sum()
    # iou_balanced_neg_sample takes a static expected count; use the cap
    neg = iou_balanced_neg_sample(assigned, max_overlaps, kn,
                                  num - int(num * pos_fraction),
                                  floor_thr, floor_fraction, num_bins)
    del num_neg
    return pos, neg
