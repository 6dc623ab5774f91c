"""The full reference assigner zoo, TPU-native (reference:
mmdet/core/bbox/assigners/{atss,point,grid,uniform,task_aligned,sim_ota,
approx_max_iou,hungarian}_assigner.py).

None of the four shipped methods use these (they assign by FCOS points /
SOLO grids / mask-Hungarian matching), but they are part of the
reference's capability surface. Every per-GT python loop in the
reference becomes a masked vectorized reduction over fixed-capacity
padded tensors, so each assigner traces under jit; semantics are pinned
by golden tests against the reference's own torch code
(tests/test_assigner_zoo.py).

Conventions (shared with assigners.py): ``gt_bboxes`` is (K, 4) padded,
``gt_valid`` (K,) masks real rows, returns ``assigned`` (N,) int32 with
-1 ignore / 0 negative / g+1 positive, plus per-assigner extras.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ...ops.boxes import aligned_iou
from .assigners import assign_wrt_overlaps, bbox_overlaps

INF = 1e8


def _labels_of(assigned: jnp.ndarray,
               gt_labels: Optional[jnp.ndarray]):
    if gt_labels is None:
        return None
    return jnp.where(assigned > 0,
                     gt_labels[jnp.clip(assigned - 1, 0, None)]
                     .astype(jnp.int32), -1)


def _centers(boxes: jnp.ndarray):
    return (boxes[:, 0] + boxes[:, 2]) / 2.0, \
        (boxes[:, 1] + boxes[:, 3]) / 2.0


def _rank_smallest(values: jnp.ndarray, axis: int) -> jnp.ndarray:
    """rank[i] = how many entries along ``axis`` are strictly smaller,
    ties broken by index — equals the position torch.topk(largest=False)
    would give (stable for distinct values)."""
    order = jnp.argsort(values, axis=axis)
    ranks = jnp.argsort(order, axis=axis)
    return ranks


def atss_assign(bboxes: jnp.ndarray,
                num_level_bboxes: Sequence[int],
                gt_bboxes: jnp.ndarray,
                gt_valid: jnp.ndarray,
                topk: int = 9,
                gt_labels: Optional[jnp.ndarray] = None):
    """ATSS (reference atss_assigner.py:60-234): per-level center-distance
    top-k candidates, mean+std IoU threshold, centers constrained inside
    the GT, IoU tie-break across GTs."""
    n = bboxes.shape[0]
    k = gt_bboxes.shape[0]
    overlaps = bbox_overlaps(bboxes[:, :4], gt_bboxes)     # (n, k)

    bx, by = _centers(bboxes[:, :4])
    gx, gy = _centers(gt_bboxes)
    dist = jnp.sqrt((bx[:, None] - gx[None, :]) ** 2
                    + (by[:, None] - gy[None, :]) ** 2)    # (n, k)

    # per-level top-k smallest distances -> candidate mask (n, k)
    cand = jnp.zeros((n, k), bool)
    start = 0
    for n_lvl in num_level_bboxes:
        sel_k = min(topk, n_lvl)
        d = dist[start:start + n_lvl]
        ranks = _rank_smallest(d, axis=0)
        cand = cand.at[start:start + n_lvl].set(ranks < sel_k)
        start += n_lvl

    # adaptive IoU threshold from the candidates: mean + std (torch .std
    # is the unbiased sample std over exactly sum(min(topk, n_lvl)) rows)
    n_cand = sum(min(topk, n_lvl) for n_lvl in num_level_bboxes)
    cf = cand.astype(overlaps.dtype)
    cand_sum = (overlaps * cf).sum(axis=0)
    mean = cand_sum / n_cand
    var = ((overlaps - mean[None, :]) ** 2 * cf).sum(axis=0) / \
        max(n_cand - 1, 1)
    thr = mean + jnp.sqrt(var)

    is_pos = cand & (overlaps >= thr[None, :])

    # candidate centers must fall inside the gt (margin 0.01)
    l_ = bx[:, None] - gt_bboxes[None, :, 0]
    t_ = by[:, None] - gt_bboxes[None, :, 1]
    r_ = gt_bboxes[None, :, 2] - bx[:, None]
    b_ = gt_bboxes[None, :, 3] - by[:, None]
    in_gts = jnp.minimum(jnp.minimum(l_, r_), jnp.minimum(t_, b_)) > 0.01
    is_pos = is_pos & in_gts & gt_valid[None, :]

    # a bbox claimed by several gts keeps the highest-IoU one
    ov_inf = jnp.where(is_pos, overlaps, -INF)
    max_ov = ov_inf.max(axis=1)
    arg = ov_inf.argmax(axis=1).astype(jnp.int32)
    assigned = jnp.where(max_ov > -INF, arg + 1, 0)
    return assigned, jnp.where(max_ov > -INF, max_ov, 0.0), \
        _labels_of(assigned, gt_labels)


def point_assign(points: jnp.ndarray,
                 gt_bboxes: jnp.ndarray,
                 gt_valid: jnp.ndarray,
                 scale: float = 4.0,
                 pos_num: int = 3,
                 gt_labels: Optional[jnp.ndarray] = None):
    """PointAssigner (reference point_assigner.py:30-134): each GT claims
    its ``pos_num`` closest same-level points; a point contested by
    several GTs goes to the closest one (earlier GT wins exact ties,
    matching the reference's strict `<` update)."""
    pts_xy = points[:, :2]
    pts_lvl = jnp.log2(points[:, 2]).astype(jnp.int32)
    lvl_min, lvl_max = pts_lvl.min(), pts_lvl.max()

    gt_xy = (gt_bboxes[:, :2] + gt_bboxes[:, 2:]) / 2.0
    gt_wh = jnp.clip(gt_bboxes[:, 2:] - gt_bboxes[:, :2], 1e-6, None)
    gt_lvl = ((jnp.log2(gt_wh[:, 0] / scale)
               + jnp.log2(gt_wh[:, 1] / scale)) / 2.0).astype(jnp.int32)
    gt_lvl = jnp.clip(gt_lvl, lvl_min, lvl_max)

    # normalized distance point->gt, masked to the gt's level
    d = jnp.linalg.norm(
        (pts_xy[:, None, :] - gt_xy[None, :, :]) / gt_wh[None, :, :],
        axis=-1)                                            # (n, k)
    same_lvl = pts_lvl[:, None] == gt_lvl[None, :]
    d_m = jnp.where(same_lvl & gt_valid[None, :], d, jnp.inf)

    # each gt keeps its pos_num closest candidates
    ranks = _rank_smallest(d_m, axis=0)
    cand = (ranks < pos_num) & jnp.isfinite(d_m)

    # contested points -> smallest distance wins; argmin keeps the
    # earliest gt on exact ties like the reference's strict '<'
    d_c = jnp.where(cand, d_m, jnp.inf)
    win = jnp.argmin(d_c, axis=1).astype(jnp.int32)
    has = jnp.isfinite(d_c.min(axis=1))
    assigned = jnp.where(has, win + 1, 0)
    return assigned, None, _labels_of(assigned, gt_labels)


def grid_assign(bboxes: jnp.ndarray,
                box_responsible_flags: jnp.ndarray,
                gt_bboxes: jnp.ndarray,
                gt_valid: jnp.ndarray,
                pos_iou_thr: float = 0.5,
                neg_iou_thr=0.3,
                min_pos_iou: float = 0.0,
                gt_max_assign_all: bool = True,
                gt_labels: Optional[jnp.ndarray] = None):
    """GridAssigner (reference grid_assigner.py:40-156): MaxIoU limited
    to cell-responsible boxes; the per-GT forced match loop becomes the
    usual largest-eligible-gt-wins reduction."""
    flags = box_responsible_flags.astype(bool)
    overlaps = bbox_overlaps(gt_bboxes, bboxes)            # (k, n)
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)
    n = bboxes.shape[0]

    assigned = jnp.full((n,), -1, jnp.int32)
    max_all = overlaps.max(axis=0)
    if isinstance(neg_iou_thr, (tuple, list)):
        neg = (max_all > neg_iou_thr[0]) & (max_all <= neg_iou_thr[1])
    else:
        neg = (max_all >= 0) & (max_all <= neg_iou_thr)
    assigned = jnp.where(neg, 0, assigned)

    # responsible-only IoUs from here on (reference :121)
    ov_r = jnp.where(flags[None, :], overlaps, -1.0)
    max_r = ov_r.max(axis=0)
    arg_r = ov_r.argmax(axis=0).astype(jnp.int32)
    pos = (max_r > pos_iou_thr) & flags
    assigned = jnp.where(pos, arg_r + 1, assigned)

    gt_max = ov_r.max(axis=1)
    gt_argmax = ov_r.argmax(axis=1)
    gt_ok = gt_valid & (gt_max > min_pos_iou)
    if gt_max_assign_all:
        claim = (ov_r == gt_max[:, None]) & flags[None, :]
    else:
        k = overlaps.shape[0]
        claim = jnp.zeros_like(ov_r, bool).at[
            jnp.arange(k), gt_argmax].set(True) & flags[None, :]
    claim = claim & gt_ok[:, None]
    gid = jnp.arange(overlaps.shape[0], dtype=jnp.int32)
    best = jnp.max(jnp.where(claim, gid[:, None] + 1, 0), axis=0)
    assigned = jnp.where(best > 0, best, assigned)
    return assigned, jnp.maximum(max_r, 0.0), \
        _labels_of(assigned, gt_labels)


def _cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    cx = (boxes[..., 0] + boxes[..., 2]) / 2
    cy = (boxes[..., 1] + boxes[..., 3]) / 2
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return jnp.stack([cx, cy, w, h], axis=-1)


def uniform_assign(bbox_pred: jnp.ndarray,
                   anchor: jnp.ndarray,
                   gt_bboxes: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   pos_ignore_thr: float = 0.15,
                   neg_ignore_thr: float = 0.7,
                   match_times: int = 4,
                   gt_labels: Optional[jnp.ndarray] = None):
    """YOLOF UniformAssigner (reference uniform_assigner.py:30-135):
    per-GT top-``match_times`` L1-closest predictions AND anchors become
    positives (pred-claims written first, anchor-claims second so anchor
    matches overwrite on conflict, like the flat scatter at :112-114);
    high-IoU unmatched predictions are ignored."""
    k = gt_bboxes.shape[0]
    c_pred = jnp.sum(jnp.abs(_cxcywh(bbox_pred)[:, None, :]
                             - _cxcywh(gt_bboxes)[None, :, :]), -1)
    c_anc = jnp.sum(jnp.abs(_cxcywh(anchor)[:, None, :]
                            - _cxcywh(gt_bboxes)[None, :, :]), -1)

    pred_ov = bbox_overlaps(bbox_pred, gt_bboxes)          # (n, k)
    anc_ov = bbox_overlaps(anchor, gt_bboxes)
    pred_ov = jnp.where(gt_valid[None, :], pred_ov, 0.0)
    anc_ov = jnp.where(gt_valid[None, :], anc_ov, 0.0)

    assigned = jnp.zeros((bbox_pred.shape[0],), jnp.int32)
    # 3. ignore predictions that already overlap some gt strongly
    assigned = jnp.where(pred_ov.max(axis=1) > neg_ignore_thr, -1,
                         assigned)

    # 4. the reference writes candidates through one flat scatter in the
    # order [for m: pred gt0..gtK-1, anchor gt0..gtK-1] — the LAST write
    # to a prior wins (uniform_assigner.py:84-114). Reproduce by taking,
    # per prior, the slot with the maximal write-order key; a slot's
    # value is gt+1 (anchor IoU >= pos_ignore_thr) or -1 (ignored pair).
    gid = jnp.arange(k, dtype=jnp.int32)
    rank_p = _rank_smallest(c_pred, axis=0)                # (n, k) = m
    rank_a = _rank_smallest(c_anc, axis=0)

    def slot_order(rank, set_id):
        order = rank * (2 * k) + set_id * k + gid[None, :]
        live = (rank < match_times) & gt_valid[None, :]
        return jnp.where(live, order, -1)

    order = jnp.concatenate([slot_order(rank_p, 0),
                             slot_order(rank_a, 1)], axis=1)  # (n, 2k)
    value = jnp.where(anc_ov >= pos_ignore_thr, gid[None, :] + 1, -1)
    value = jnp.concatenate([value, value], axis=1)
    best = jnp.argmax(order, axis=1)
    has = jnp.max(order, axis=1) >= 0
    picked = jnp.take_along_axis(value, best[:, None], axis=1)[:, 0]
    assigned = jnp.where(has, picked.astype(jnp.int32), assigned)
    return assigned, anc_ov.max(axis=0), \
        _labels_of(assigned, gt_labels)


def task_aligned_assign(pred_scores: jnp.ndarray,
                        decode_bboxes: jnp.ndarray,
                        anchors: jnp.ndarray,
                        gt_bboxes: jnp.ndarray,
                        gt_valid: jnp.ndarray,
                        gt_labels: jnp.ndarray,
                        topk: int = 13,
                        alpha: float = 1.0,
                        beta: float = 6.0):
    """TOOD TaskAlignedAssigner (reference task_aligned_assigner.py:
    40-151): alignment metric = score^alpha * IoU^beta, top-k per GT,
    centers in GT, IoU tie-break."""
    n = anchors.shape[0]
    overlaps = jax.lax.stop_gradient(
        bbox_overlaps(decode_bboxes, gt_bboxes))           # (n, k)
    scores = jax.lax.stop_gradient(
        pred_scores[:, jnp.clip(gt_labels, 0, None)])      # (n, k)
    metric = scores ** alpha * overlaps ** beta
    metric = jnp.where(gt_valid[None, :], metric, -jnp.inf)

    sel_k = min(topk, n)
    ranks = _rank_smallest(-metric, axis=0)
    is_pos = (ranks < sel_k) & (metric > 0)

    ax, ay = _centers(anchors[:, :4])
    l_ = ax[:, None] - gt_bboxes[None, :, 0]
    t_ = ay[:, None] - gt_bboxes[None, :, 1]
    r_ = gt_bboxes[None, :, 2] - ax[:, None]
    b_ = gt_bboxes[None, :, 3] - ay[:, None]
    in_gts = jnp.minimum(jnp.minimum(l_, r_), jnp.minimum(t_, b_)) > 0.01
    is_pos = is_pos & in_gts & gt_valid[None, :]

    ov_inf = jnp.where(is_pos, overlaps, -INF)
    max_ov = ov_inf.max(axis=1)
    arg = ov_inf.argmax(axis=1).astype(jnp.int32)
    assigned = jnp.where(max_ov > -INF, arg + 1, 0)
    metrics = jnp.where(max_ov > -INF,
                        jnp.take_along_axis(metric, arg[:, None],
                                            axis=1)[:, 0], 0.0)
    return assigned, jnp.where(max_ov > -INF, max_ov, 0.0), \
        _labels_of(assigned, gt_labels), metrics


def sim_ota_assign(pred_scores: jnp.ndarray,
                   priors: jnp.ndarray,
                   decoded_bboxes: jnp.ndarray,
                   gt_bboxes: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   gt_labels: jnp.ndarray,
                   center_radius: float = 2.5,
                   candidate_topk: int = 10,
                   iou_weight: float = 3.0,
                   cls_weight: float = 1.0,
                   eps: float = 1e-7):
    """YOLOX SimOTA (reference sim_ota_assigner.py:95-257): dynamic-k
    matching on a cls+IoU cost, candidates restricted to priors inside a
    GT box or its center region. The reference subsets valid priors;
    here invalid priors carry +2*INF cost so they never match."""
    n = decoded_bboxes.shape[0]
    k = gt_bboxes.shape[0]

    # in-gt / in-center-region info (reference get_in_gt_and_in_center_info)
    px, py = priors[:, 0], priors[:, 1]
    sx, sy = priors[:, 2], priors[:, 3]
    l_ = px[:, None] - gt_bboxes[None, :, 0]
    t_ = py[:, None] - gt_bboxes[None, :, 1]
    r_ = gt_bboxes[None, :, 2] - px[:, None]
    b_ = gt_bboxes[None, :, 3] - py[:, None]
    in_gt = (jnp.minimum(jnp.minimum(l_, r_), jnp.minimum(t_, b_)) > 0) \
        & gt_valid[None, :]
    gx, gy = _centers(gt_bboxes)
    cl = px[:, None] - (gx[None, :] - center_radius * sx[:, None])
    ct = py[:, None] - (gy[None, :] - center_radius * sy[:, None])
    cr = (gx[None, :] + center_radius * sx[:, None]) - px[:, None]
    cb = (gy[None, :] + center_radius * sy[:, None]) - py[:, None]
    in_ct = (jnp.minimum(jnp.minimum(cl, cr), jnp.minimum(ct, cb)) > 0) \
        & gt_valid[None, :]
    valid = in_gt.any(axis=1) | in_ct.any(axis=1)          # (n,)
    in_both = in_gt & in_ct

    ious = bbox_overlaps(decoded_bboxes, gt_bboxes)        # (n, k)
    ious = jnp.where(gt_valid[None, :] & valid[:, None], ious, 0.0)
    iou_cost = -jnp.log(ious + eps)

    onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0, None),
                            pred_scores.shape[-1],
                            dtype=pred_scores.dtype)       # (k, C)
    sq = jnp.sqrt(jnp.clip(pred_scores, 0.0, 1.0))
    # BCE(sqrt(p), onehot) summed over classes, broadcast (n, k)
    bce = -(onehot[None] * jnp.log(jnp.clip(sq[:, None], eps, None))
            + (1 - onehot[None])
            * jnp.log(jnp.clip(1 - sq[:, None], eps, None)))
    cls_cost = bce.sum(-1)

    cost = cls_cost * cls_weight + iou_cost * iou_weight \
        + (~in_both) * INF
    cost = jnp.where(valid[:, None] & gt_valid[None, :], cost, 2 * INF)

    # dynamic-k: k_g = clamp(int(sum top-10 IoUs), 1)
    sel_k = min(candidate_topk, n)
    top_ious = jax.lax.top_k(ious.T, sel_k)[0]             # (k, sel_k)
    dyn_ks = jnp.clip(top_ious.sum(-1).astype(jnp.int32), 1, None)

    ranks = _rank_smallest(cost, axis=0)                   # (n, k)
    matching = (ranks < dyn_ks[None, :]) & gt_valid[None, :] & \
        valid[:, None]

    # priors matched to >1 gt keep the min-cost gt
    multi = matching.sum(axis=1) > 1
    argmin_cost = jnp.argmin(jnp.where(gt_valid[None, :], cost, jnp.inf),
                             axis=1)
    keep_one = jax.nn.one_hot(argmin_cost, k, dtype=bool)
    matching = jnp.where(multi[:, None], matching & keep_one, matching)

    fg = matching.any(axis=1)
    arg = jnp.argmax(matching, axis=1).astype(jnp.int32)
    assigned = jnp.where(fg, arg + 1, 0)
    matched_iou = (matching * ious).sum(axis=1)
    max_ov = jnp.where(fg, matched_iou, -INF)
    return assigned, max_ov, _labels_of(assigned, gt_labels)


def approx_max_iou_assign(approxs: jnp.ndarray,
                          squares: jnp.ndarray,
                          approxs_per_octave: int,
                          gt_bboxes: jnp.ndarray,
                          gt_valid: jnp.ndarray,
                          pos_iou_thr: float = 0.5,
                          neg_iou_thr=0.4,
                          min_pos_iou: float = 0.0,
                          gt_max_assign_all: bool = True,
                          match_low_quality: bool = True,
                          gt_bboxes_ignore: Optional[jnp.ndarray] = None,
                          ignore_valid: Optional[jnp.ndarray] = None,
                          ignore_iof_thr: float = -1.0,
                          ignore_wrt_candidates: bool = True,
                          gt_labels: Optional[jnp.ndarray] = None):
    """GuidedAnchoring ApproxMaxIoUAssigner (reference
    approx_max_iou_assigner.py:60-146): group max IoU over each square's
    ``approxs_per_octave`` approx anchors, then plain MaxIoU."""
    num_squares = squares.shape[0]
    ov = bbox_overlaps(
        approxs.reshape(num_squares, approxs_per_octave, 4)
        .reshape(-1, 4), gt_bboxes)
    ov = ov.reshape(num_squares, approxs_per_octave, -1).max(axis=1)
    overlaps = ov.T                                        # (k, n)
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)

    if ignore_iof_thr > 0 and gt_bboxes_ignore is not None:
        if ignore_wrt_candidates:
            iof = bbox_overlaps(squares, gt_bboxes_ignore, mode='iof')
            if ignore_valid is not None:
                iof = jnp.where(ignore_valid[None, :], iof, 0.0)
            ign = iof.max(axis=1) > ignore_iof_thr
        else:
            iof = bbox_overlaps(gt_bboxes_ignore, squares, mode='iof')
            if ignore_valid is not None:
                iof = jnp.where(ignore_valid[:, None], iof, 0.0)
            ign = iof.max(axis=0) > ignore_iof_thr
        overlaps = jnp.where(ign[None, :], -1.0, overlaps)

    return assign_wrt_overlaps(
        overlaps, gt_valid, pos_iou_thr=pos_iou_thr,
        neg_iou_thr=neg_iou_thr, min_pos_iou=min_pos_iou,
        gt_max_assign_all=gt_max_assign_all,
        match_low_quality=match_low_quality, gt_labels=gt_labels)


def focal_loss_cost(cls_pred: jnp.ndarray, gt_labels: jnp.ndarray,
                    weight: float = 1.0, alpha: float = 0.25,
                    gamma: float = 2.0, eps: float = 1e-12) -> jnp.ndarray:
    """FocalLossCost (reference match_cost.py:64-92, binary_input=False):
    pos-neg focal cost at the GT class."""
    p = jax.nn.sigmoid(cls_pred)                           # (q, C)
    neg_cost = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma
    pos_cost = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    cost = pos_cost[:, jnp.clip(gt_labels, 0, None)] \
        - neg_cost[:, jnp.clip(gt_labels, 0, None)]
    return cost * weight


def bbox_l1_cost(bbox_pred: jnp.ndarray, gt_bboxes: jnp.ndarray,
                 weight: float = 1.0) -> jnp.ndarray:
    """BBoxL1Cost (reference match_cost.py:11-38), xyxy inputs expected
    already normalized the way the caller wants."""
    return jnp.abs(bbox_pred[:, None, :]
                   - gt_bboxes[None, :, :]).sum(-1) * weight


def iou_cost(bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray,
             weight: float = 1.0, mode: str = 'giou') -> jnp.ndarray:
    """IoUCost (reference match_cost.py:95-125): -IoU/-GIoU pairwise."""
    q, g = bboxes.shape[0], gt_bboxes.shape[0]
    a = jnp.broadcast_to(bboxes[:, None, :], (q, g, 4))
    b = jnp.broadcast_to(gt_bboxes[None, :, :], (q, g, 4))
    ov = aligned_iou(a, b, mode=mode)
    return -ov * weight


def dice_cost(mask_preds: jnp.ndarray, gt_masks: jnp.ndarray,
              weight: float = 1.0, pred_act: bool = True,
              eps: float = 1e-3, naive_dice: bool = True) -> jnp.ndarray:
    """DiceCost (reference match_cost.py:200-258): pairwise soft-dice
    cost between (q, ...) predicted and (g, ...) gt masks."""
    p = jax.nn.sigmoid(mask_preds) if pred_act else mask_preds
    p = p.reshape(p.shape[0], -1)
    t = gt_masks.reshape(gt_masks.shape[0], -1)
    num = 2 * jnp.einsum('ql,gl->qg', p, t)
    if naive_dice:
        den = p.sum(-1)[:, None] + t.sum(-1)[None, :]
    else:
        den = (p * p).sum(-1)[:, None] + (t * t).sum(-1)[None, :]
    return -( (num + eps) / (den + eps) ) * weight


def hungarian_bbox_assign(bbox_pred: jnp.ndarray,
                          cls_pred: jnp.ndarray,
                          gt_bboxes: jnp.ndarray,
                          gt_valid: jnp.ndarray,
                          gt_labels: jnp.ndarray,
                          img_shape,
                          cls_weight: float = 1.0,
                          reg_weight: float = 1.0,
                          iou_weight: float = 1.0,
                          iou_mode: str = 'giou'):
    """DETR-style box HungarianAssigner (reference
    hungarian_assigner.py:60-146): FocalLossCost + normalized-cxcywh L1 +
    GIoU cost, solved by the on-device Jonker-Volgenant LSA (ops/lsa.py)
    instead of the reference's scipy CPU hop. ``bbox_pred`` is
    normalized (cx, cy, w, h)."""
    from ...ops.lsa import solve_lsa

    img_h, img_w = img_shape[0], img_shape[1]
    factor = jnp.asarray([img_w, img_h, img_w, img_h], bbox_pred.dtype)

    cls_cost = focal_loss_cost(cls_pred, gt_labels) * cls_weight
    reg_cost = bbox_l1_cost(bbox_pred, gt_bboxes / factor) * reg_weight
    cx, cy, w, h = (bbox_pred[:, 0], bbox_pred[:, 1], bbox_pred[:, 2],
                    bbox_pred[:, 3])
    pred_xyxy = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2,
                           cy + h / 2], -1) * factor
    i_cost = iou_cost(pred_xyxy, gt_bboxes, mode=iou_mode) * iou_weight
    cost = cls_cost + reg_cost + i_cost
    cost = jnp.where(gt_valid[None, :], cost, 1e9)

    # solve over (gts, queries): every (padded) gt row gets one query;
    # invalid gts' matches are discarded afterwards
    q_of_gt = solve_lsa(cost.T)                            # (k,)
    n_q = bbox_pred.shape[0]
    assigned = jnp.zeros((n_q,), jnp.int32)
    gidx = jnp.arange(gt_valid.shape[0], dtype=jnp.int32)
    assigned = assigned.at[q_of_gt].max(
        jnp.where(gt_valid, gidx + 1, 0))
    return assigned, None, _labels_of(assigned, gt_labels)
