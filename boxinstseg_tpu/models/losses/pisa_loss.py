"""PISA: importance-based sample reweighting + classification-aware
regression loss (reference: mmdet/models/losses/pisa_loss.py — isr_p
:9-122, carl_loss :125-210).

TPU-native redesign: the reference nests python loops over unique
labels/GTs and mutates boolean-indexed slices; here the IoU-HLR double
ranking is one vectorized grouped-rank computation (lexsort + segment
offsets) over fixed-size padded tensors, so the whole thing traces
under jit.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.boxes import aligned_iou


def _rank_desc_in_group(values: jnp.ndarray, group: jnp.ndarray,
                        valid: jnp.ndarray) -> jnp.ndarray:
    """rank[i] = 0-based descending rank of values[i] within its group
    (the reference's double argsort, pisa_loss.py:93-101). Invalid rows
    get arbitrary ranks; callers must mask them."""
    n = values.shape[0]
    big = jnp.int32(n + 1)
    g = jnp.where(valid, group.astype(jnp.int32), big)
    order = jnp.lexsort((-values, g))                  # group asc, value desc
    sg = g[order]
    pos = jnp.arange(n)
    start = jnp.concatenate([jnp.array([True]), sg[1:] != sg[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(start, pos, -1))
    rank_sorted = pos - seg_start
    return jnp.zeros((n,), jnp.int32).at[order].set(
        rank_sorted.astype(jnp.int32))


def isr_p(cls_score: jnp.ndarray,
          bbox_pred: jnp.ndarray,
          bbox_targets: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                              jnp.ndarray],
          rois: jnp.ndarray,
          gts: jnp.ndarray,
          loss_cls: Callable,
          bbox_decode: Callable,
          k: float = 2.0,
          bias: float = 0.0,
          num_class: int = 80):
    """Importance-based Sample Reweighting, positive part.

    Args mirror the reference except: ``gts`` is a flat (N,) global-GT
    index per sample (the reference concatenates
    ``sampling_results[i].pos_assigned_gt_inds`` the same way,
    pisa_loss.py:51-59), ``bbox_decode(rois, deltas) -> boxes`` replaces
    the bbox_coder object. Returns the updated (labels, label_weights,
    bbox_targets, bbox_weights).
    """
    labels, label_weights, bbox_t, bbox_w = bbox_targets
    pos = (labels >= 0) & (labels < num_class)
    labels_c = jnp.clip(labels, 0, num_class - 1)

    cls_score = jax.lax.stop_gradient(cls_score)
    bbox_pred = jax.lax.stop_gradient(bbox_pred)
    if rois.shape[-1] == 5:
        rois = rois[:, 1:]
    if bbox_pred.shape[-1] > 4:
        bp = bbox_pred.reshape(bbox_pred.shape[0], -1, 4)
        delta_pred = jnp.take_along_axis(
            bp, labels_c[:, None, None].repeat(4, -1), axis=1)[:, 0]
    else:
        delta_pred = bbox_pred
    boxes_pred = bbox_decode(rois, delta_pred)
    boxes_target = bbox_decode(rois, bbox_t)
    ious = jnp.where(pos, aligned_iou(boxes_pred, boxes_target), 0.0)

    # max_l_num = max #positives sharing one label
    counts = jnp.zeros((num_class,), jnp.float32).at[labels_c].add(
        pos.astype(jnp.float32))
    max_l_num = counts.max()

    # IoU-HLR: rank inside each (label, gt) group, then inside each label
    n_gt = gts.max() + 1 if gts.size else 1
    fine_group = labels_c * (jnp.asarray(n_gt, jnp.int32) + 1) + \
        jnp.clip(gts, 0, None).astype(jnp.int32)
    t_rank = _rank_desc_in_group(ious, fine_group, pos)
    ious2 = ious + jnp.where(pos, max_l_num - t_rank.astype(ious.dtype),
                             0.0)
    l_rank = _rank_desc_in_group(ious2, labels_c, pos)
    hlr_w = (max_l_num - l_rank.astype(ious.dtype)) / \
        jnp.maximum(max_l_num, 1.0)

    pos_imp = label_weights * hlr_w
    pos_imp = (bias + pos_imp * (1.0 - bias)) ** k

    # renormalize so the weighted cls loss keeps its original value
    pos_loss_cls = loss_cls(cls_score, labels_c,
                            reduction_override='none')
    if pos_loss_cls.ndim > 1:
        pos_loss_cls = pos_loss_cls.sum(axis=-1)
    pm = pos.astype(pos_loss_cls.dtype)
    ori = (pos_loss_cls * label_weights * pm).sum()
    new = (pos_loss_cls * pos_imp * pm).sum()
    ratio = ori / jnp.maximum(new, 1e-12)
    new_w = jnp.where(pos, pos_imp * ratio, label_weights)
    return labels, new_w, bbox_t, bbox_w


def carl_loss(cls_score: jnp.ndarray,
              labels: jnp.ndarray,
              bbox_pred: jnp.ndarray,
              bbox_targets: jnp.ndarray,
              loss_bbox: Callable,
              k: float = 1.0,
              bias: float = 0.2,
              avg_factor: Optional[float] = None,
              sigmoid: bool = False,
              num_class: int = 80):
    """Classification-Aware Regression Loss (reference carl_loss
    :125-210), static-shape masked form. ``loss_bbox(pred, target)``
    must return the elementwise (N, 4) loss."""
    pos = (labels >= 0) & (labels < num_class)
    labels_c = jnp.clip(labels, 0, num_class - 1)
    if sigmoid:
        scores = jax.nn.sigmoid(cls_score)
    else:
        scores = jax.nn.softmax(cls_score, axis=-1)
    pos_score = jnp.take_along_axis(scores, labels_c[:, None],
                                    axis=1)[:, 0]
    w = (bias + (1.0 - bias) * pos_score) ** k
    pm = pos.astype(w.dtype)
    num_pos = pm.sum()
    w = w * num_pos / jnp.maximum((w * pm).sum(), 1e-12)

    if avg_factor is None:
        avg_factor = bbox_targets.shape[0]
    if bbox_pred.shape[-1] > 4:
        bp = bbox_pred.reshape(bbox_pred.shape[0], -1, 4)
        bbox_pred = jnp.take_along_axis(
            bp, labels_c[:, None, None].repeat(4, -1), axis=1)[:, 0]
    reg = loss_bbox(bbox_pred, bbox_targets) / avg_factor
    loss = (reg * (w * pm)[:, None]).sum()
    return dict(loss_carl=loss)
