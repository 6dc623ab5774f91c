"""Box transforms and IoU math (reference: mmdet/core/bbox/transforms.py,
mmdet/models/losses/iou_loss.py) in pure jnp with static shapes."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def distance2bbox(points: jnp.ndarray, distance: jnp.ndarray,
                  max_shape: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Decode (l, t, r, b) distances at ``points`` into xyxy boxes.

    points: (..., 2) as (x, y); distance: (..., 4); max_shape: (..., 2) as
    (h, w) or None.
    """
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        h = max_shape[..., 0]
        w = max_shape[..., 1]
        x1 = jnp.clip(x1, 0, w)
        y1 = jnp.clip(y1, 0, h)
        x2 = jnp.clip(x2, 0, w)
        y2 = jnp.clip(y2, 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2distance(points: jnp.ndarray, bboxes: jnp.ndarray) -> jnp.ndarray:
    """Encode xyxy boxes at points into (l, t, r, b)."""
    l = points[..., 0] - bboxes[..., 0]
    t = points[..., 1] - bboxes[..., 1]
    r = bboxes[..., 2] - points[..., 0]
    b = bboxes[..., 3] - points[..., 1]
    return jnp.stack([l, t, r, b], axis=-1)


def bbox_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0)


def bbox_overlaps(a: jnp.ndarray, b: jnp.ndarray, mode: str = 'iou',
                  eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise IoU / GIoU between (..., N, 4) and (..., M, 4) -> (..., N, M)."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = bbox_area(a)[..., :, None] + bbox_area(b)[..., None, :] - inter
    iou = inter / jnp.maximum(union, eps)
    if mode == 'iou':
        return iou
    if mode == 'giou':
        lt_e = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
        rb_e = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
        wh_e = jnp.clip(rb_e - lt_e, 0)
        enclose = jnp.maximum(wh_e[..., 0] * wh_e[..., 1], eps)
        return iou - (enclose - union) / enclose
    raise ValueError(mode)


def aligned_iou(a: jnp.ndarray, b: jnp.ndarray, mode: str = 'iou',
                eps: float = 1e-6) -> jnp.ndarray:
    """Elementwise IoU / GIoU between aligned (..., 4) box arrays."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = bbox_area(a) + bbox_area(b) - inter
    iou = inter / jnp.maximum(union, eps)
    if mode == 'iou':
        return iou
    if mode == 'giou':
        lt_e = jnp.minimum(a[..., :2], b[..., :2])
        rb_e = jnp.maximum(a[..., 2:], b[..., 2:])
        wh_e = jnp.clip(rb_e - lt_e, 0)
        enclose = jnp.maximum(wh_e[..., 0] * wh_e[..., 1], eps)
        return iou - (enclose - union) / enclose
    raise ValueError(mode)


def bbox_overlaps_np(a, b, eps: float = 1e-6):
    """Numpy pairwise IoU for host-side analysis tools
    (reference: mmdet/core/evaluation/bbox_overlaps.py)."""
    import numpy as np
    a = np.asarray(a, np.float64).reshape(-1, 4)
    b = np.asarray(b, np.float64).reshape(-1, 4)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, eps)
