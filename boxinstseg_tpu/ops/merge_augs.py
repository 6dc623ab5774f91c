"""Test-time-augmentation merging (reference:
mmdet/core/post_processing/merge_augs.py :13-160 and the bbox
flip/mapping helpers in mmdet/core/bbox/transforms.py :22-90).

The shipped configs run single-scale no-flip testing, but the reference
toolbox supports multi-scale + flip TTA via MultiScaleFlipAug; these
complete that surface. Everything is jnp and static-shape (proposal
merging reuses the fixed-capacity greedy NMS)."""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .nms import greedy_nms


def bbox_flip(bboxes: jnp.ndarray, img_shape,
              direction: str = 'horizontal') -> jnp.ndarray:
    """Flip (..., 4k) xyxy boxes inside ``img_shape`` (h, w)
    (reference transforms.py:22-49)."""
    assert bboxes.shape[-1] % 4 == 0
    h, w = img_shape[0], img_shape[1]
    x1, y1, x2, y2 = (bboxes[..., 0::4], bboxes[..., 1::4],
                      bboxes[..., 2::4], bboxes[..., 3::4])
    if direction == 'horizontal':
        x1, x2 = w - x2, w - x1
    elif direction == 'vertical':
        y1, y2 = h - y2, h - y1
    elif direction == 'diagonal':
        x1, x2 = w - x2, w - x1
        y1, y2 = h - y2, h - y1
    else:
        raise ValueError(direction)
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    return out.reshape(bboxes.shape)


def bbox_mapping(bboxes, img_shape, scale_factor, flip,
                 flip_direction='horizontal'):
    """original scale -> testing scale (reference transforms.py:51-60)."""
    out = bboxes * jnp.asarray(scale_factor, bboxes.dtype)
    if flip:
        out = bbox_flip(out, img_shape, flip_direction)
    return out


def bbox_mapping_back(bboxes, img_shape, scale_factor, flip,
                      flip_direction='horizontal'):
    """testing scale -> original scale (reference transforms.py:63-90)."""
    out = bbox_flip(bboxes, img_shape, flip_direction) if flip else bboxes
    return out / jnp.asarray(scale_factor, bboxes.dtype)


def merge_aug_proposals(aug_proposals: Sequence[jnp.ndarray],
                        img_metas: Sequence[dict], cfg: dict
                        ) -> jnp.ndarray:
    """NMS-merge augmented (n, 5) proposals mapped back to the original
    scale (reference merge_augs.py:13-84)."""
    recovered = []
    for props, meta in zip(aug_proposals, img_metas):
        boxes = bbox_mapping_back(props[:, :4], meta['img_shape'],
                                  meta['scale_factor'], meta['flip'],
                                  meta.get('flip_direction', 'horizontal'))
        recovered.append(jnp.concatenate([boxes, props[:, 4:5]], axis=1))
    allp = jnp.concatenate(recovered, axis=0)
    nms_cfg = cfg.get('nms', dict(iou_threshold=cfg.get('nms_thr', 0.7)))
    max_num = int(cfg.get('max_per_img', cfg.get('max_num',
                                                 allp.shape[0])))
    keep, valid = greedy_nms(allp[:, :4], allp[:, 4],
                             jnp.zeros((allp.shape[0],), jnp.int32),
                             float(nms_cfg['iou_threshold']),
                             min(max_num, allp.shape[0]))
    out = allp[keep]
    return jnp.where(valid[:, None], out, 0.0)


def merge_aug_bboxes(aug_bboxes, aug_scores, img_metas, test_cfg=None):
    """Average augmented detections after mapping back
    (reference merge_augs.py:87-115)."""
    recovered = []
    for bboxes, meta in zip(aug_bboxes, img_metas):
        info = meta[0] if isinstance(meta, (list, tuple)) else meta
        recovered.append(bbox_mapping_back(
            bboxes, info['img_shape'], info['scale_factor'], info['flip'],
            info.get('flip_direction', 'horizontal')))
    bboxes = jnp.stack(recovered).mean(axis=0)
    if aug_scores is None:
        return bboxes
    return bboxes, jnp.stack(aug_scores).mean(axis=0)


def merge_aug_scores(aug_scores):
    """reference merge_augs.py:118-123."""
    if isinstance(aug_scores[0], jnp.ndarray):
        return jnp.stack(aug_scores).mean(axis=0)
    return np.mean(aug_scores, axis=0)


def merge_aug_masks(aug_masks, img_metas, test_cfg=None,
                    weights: Optional[Sequence[float]] = None):
    """Unflip + (weighted-)average augmented (n, c, h, w) mask logits
    (reference merge_augs.py:126-160)."""
    recovered: List[jnp.ndarray] = []
    for mask, meta in zip(aug_masks, img_metas):
        info = meta[0] if isinstance(meta, (list, tuple)) else meta
        if info['flip']:
            d = info.get('flip_direction', 'horizontal')
            if d == 'horizontal':
                mask = mask[..., ::-1]
            elif d == 'vertical':
                mask = mask[..., ::-1, :]
            elif d == 'diagonal':
                mask = mask[..., ::-1, ::-1]
            else:
                raise ValueError(d)
        recovered.append(jnp.asarray(mask))
    stacked = jnp.stack(recovered)
    if weights is None:
        return stacked.mean(axis=0)
    w = jnp.asarray(weights, stacked.dtype)
    return (stacked * w[:, None, None, None, None]).sum(0) / w.sum()
