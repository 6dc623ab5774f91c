"""Batched FCOS point-target assignment with static shapes.

Re-derives the reference's per-image python assignment
(reference: condinst_head.py:550-633 _get_target_single) as one vectorized
(B, P, G) computation inside jit: padded GT slots carry a validity mask and
are excluded by pushing their area to +inf, exactly like the reference
pushes non-matching candidates to INF before the min-area argmin.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

INF = 1e8


class FcosTargets(NamedTuple):
    labels: jnp.ndarray        # (B, P) int32 in [0, num_classes]; bg = num_classes
    bbox_targets: jnp.ndarray  # (B, P, 4) l,t,r,b (divided by stride if norm_on_bbox)
    gt_inds: jnp.ndarray       # (B, P) int32 index into the image's GT slots; -1 = bg
    centerness: jnp.ndarray    # (B, P) centerness target (0 where bg)


def centerness_target(bbox_targets: jnp.ndarray) -> jnp.ndarray:
    """sqrt((min_lr/max_lr) * (min_tb/max_tb)) (reference
    condinst_head.py:855-876)."""
    lr = bbox_targets[..., (0, 2)]
    tb = bbox_targets[..., (1, 3)]
    ctr = (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-12)) * (
        tb.min(-1) / jnp.maximum(tb.max(-1), 1e-12))
    return jnp.sqrt(jnp.maximum(ctr, 0.0))


def fcos_targets(points: jnp.ndarray,
                 strides: jnp.ndarray,
                 regress_ranges: jnp.ndarray,
                 gt_bboxes: jnp.ndarray,
                 gt_labels: jnp.ndarray,
                 gt_valid: jnp.ndarray,
                 num_classes: int,
                 center_sampling: bool = True,
                 center_sample_radius: float = 1.5,
                 norm_on_bbox: bool = True) -> FcosTargets:
    """Assign each point of each image to a GT (or background).

    Args:
      points: (P, 2) xy; strides: (P,); regress_ranges: (P, 2).
      gt_bboxes: (B, G, 4) xyxy in input-canvas coords.
      gt_labels: (B, G) int32; gt_valid: (B, G) bool (padded slots False).
    """
    B, G = gt_labels.shape
    P = points.shape[0]
    xs = points[:, 0][None, :, None]            # (1, P, 1)
    ys = points[:, 1][None, :, None]
    gx1 = gt_bboxes[:, None, :, 0]              # (B, 1, G)
    gy1 = gt_bboxes[:, None, :, 1]
    gx2 = gt_bboxes[:, None, :, 2]
    gy2 = gt_bboxes[:, None, :, 3]

    left = xs - gx1                              # (B, P, G)
    right = gx2 - xs
    top = ys - gy1
    bottom = gy2 - ys

    if center_sampling:
        radius = center_sample_radius
        cx = (gx1 + gx2) / 2
        cy = (gy1 + gy2) / 2
        r = (strides * radius)[None, :, None]
        cb_x1 = jnp.maximum(cx - r, gx1)
        cb_y1 = jnp.maximum(cy - r, gy1)
        cb_x2 = jnp.minimum(cx + r, gx2)
        cb_y2 = jnp.minimum(cy + r, gy2)
        inside = (jnp.minimum(
            jnp.minimum(xs - cb_x1, cb_x2 - xs),
            jnp.minimum(ys - cb_y1, cb_y2 - ys)) > 0)
    else:
        inside = (jnp.minimum(jnp.minimum(left, right),
                              jnp.minimum(top, bottom)) > 0)

    max_dist = jnp.maximum(jnp.maximum(left, right),
                           jnp.maximum(top, bottom))
    rr = regress_ranges[None, :, :]              # (1, P, 2)
    in_range = (max_dist >= rr[..., 0:1]) & (max_dist <= rr[..., 1:2])

    areas = ((gx2 - gx1) * (gy2 - gy1))          # (B, 1, G) -> broadcast
    areas = jnp.broadcast_to(areas, (B, P, G))
    bad = (~inside) | (~in_range) | (~gt_valid[:, None, :])
    areas = jnp.where(bad, INF, areas)

    min_area = areas.min(axis=-1)                # (B, P)
    min_inds = areas.argmin(axis=-1)             # (B, P)
    is_bg = min_area >= INF

    gt_inds = jnp.where(is_bg, -1, min_inds).astype(jnp.int32)

    # one-hot select over the small G axis instead of take_along_axis:
    # per-(B, P) gathers carry batch dims and serialize on TPU
    # (~7 ms/step on BoxInst, profiled); a masked reduce is one fused
    # VPU pass over tensors that are already live
    sel = (jnp.arange(G)[None, None] == min_inds[..., None])
    pick = lambda t: jnp.where(sel, t, 0.0).sum(axis=-1)
    labels = jnp.where(sel, gt_labels[:, None, :], 0).sum(axis=-1)
    labels = jnp.where(is_bg, num_classes, labels).astype(jnp.int32)
    bt = jnp.stack([pick(left), pick(top), pick(right), pick(bottom)],
                   axis=-1)                       # (B, P, 4)
    ctr = jnp.where(is_bg, 0.0, centerness_target(bt))
    if norm_on_bbox:
        bt = bt / strides[None, :, None]
    return FcosTargets(labels=labels, bbox_targets=bt, gt_inds=gt_inds,
                       centerness=ctr)


def sample_positives_per_gt(scores: jnp.ndarray,
                            gt_inds: jnp.ndarray,
                            gt_valid: jnp.ndarray,
                            capacity: int) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                    jnp.ndarray]:
    """Fixed-capacity positive sampling, reference-faithful
    (condinst_head.py:1186-1232 topk_per_img branch).

    Per image: each GT may contribute at most
    ``inst_per_gt = max(capacity // num_gts, 1)`` positions, ranked by
    score; the best-ranked position of every GT is guaranteed a slot before
    remaining slots are filled by global score order.

    Args:
      scores: (B, P) ranking score (sigmoid cls_max * sigmoid centerness).
      gt_inds: (B, P) assignment from fcos_targets (-1 = background).
      gt_valid: (B, G) bool.
      capacity: K, static samples per image.
    Returns:
      point_idx: (B, K) int32 indices into P; sample_gt: (B, K) int32 GT
      slot per sample; valid: (B, K) bool.
    """
    B, P = scores.shape
    G = gt_valid.shape[1]
    K = capacity

    # ONE (B, P) sort + rank-within-group cumsum instead of a top_k over
    # the (B, G, P) grouped-score tensor: lax.top_k lowers to a full sort
    # of G x the data (4.9 ms/step of the BoxInst b8 bench, profiled);
    # payloads ride the sort so no gathers are needed. Selection order is
    # identical (rank-0-per-GT first, then by score); only exact score
    # TIES can resolve differently (by point index instead of GT slot).
    onehot = gt_inds[..., None] == jnp.arange(G)[None, None, :]  # (B,P,G)
    ok = (onehot & gt_valid[:, None, :]).any(-1)
    s = jnp.where(ok, scores, -jnp.inf).astype(jnp.float32)
    pid = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (B, P))
    gts = jnp.where(ok, gt_inds, 0).astype(jnp.int32)
    # stable descending sort by score (f32 stable sort is cheap on TPU;
    # ties keep point-index order, matching top_k's index tie-break)
    neg_s, pid_s, gt_s = jax.lax.sort((-s, pid, gts), num_keys=1,
                                      dimension=1, is_stable=True)
    fin = neg_s < jnp.inf

    # rank of each entry within its GT group = inclusive same-group
    # count at its sorted position - 1
    oh_s = (gt_s[..., None] == jnp.arange(G)) & fin[..., None]
    cum = jnp.cumsum(oh_s.astype(jnp.int32), axis=1)
    r = jnp.where(oh_s, cum, 0).sum(-1) - 1                   # (B, P)

    num_gts = jnp.maximum(gt_valid.sum(axis=1), 1)            # (B,)
    inst_per_gt = jnp.maximum(K // num_gts, 1)                # (B,)
    keep = fin & (r >= 0) & (r < inst_per_gt[:, None])
    rank0 = keep & (r == 0)

    # output slot: every GT's best candidate first (score order), then
    # the remaining kept candidates by score — the same order the
    # +1e9-boosted priority top_k produced
    c0 = jnp.cumsum(rank0.astype(jnp.int32), axis=1)
    n0 = c0[:, -1:]
    c1 = jnp.cumsum((keep & ~rank0).astype(jnp.int32), axis=1)
    slot = jnp.where(rank0, c0 - 1, n0 + c1 - 1)
    sel = keep & (slot < K)

    # compact to the first K slots with a second (f32-keyed) sort
    key2 = jnp.where(sel, slot, P + K).astype(jnp.float32)
    _, pid2, gt2, flag2 = jax.lax.sort(
        (key2, pid_s, gt_s, sel.astype(jnp.int32)), num_keys=1,
        dimension=1, is_stable=True)
    kc = min(K, P)
    point_idx = pid2[:, :kc]
    sample_gt = gt2[:, :kc]
    valid = flag2[:, :kc] == 1
    if kc < K:
        pad = ((0, 0), (0, K - kc))
        point_idx = jnp.pad(point_idx, pad)
        sample_gt = jnp.pad(sample_gt, pad)
        valid = jnp.pad(valid, pad)
    point_idx = jnp.where(valid, point_idx, 0).astype(jnp.int32)
    sample_gt = jnp.where(valid, sample_gt, 0).astype(jnp.int32)
    return point_idx, sample_gt, valid
