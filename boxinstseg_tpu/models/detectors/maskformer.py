"""MaskFormer-style detector + Box2Mask alias + fusion post-processing
(reference: mmdet/models/detectors/maskformer.py, box2mask.py, and
mmdet/models/seg_heads/panoptic_fusion_heads/maskformer_fusion_head.py —
only the instance branch is exercised by Box2Mask, :112-162)."""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...registry import BACKBONES, DETECTORS, HEADS, NECKS
from ..layers import f32_tree


# reference: mmdet/core/evaluation/panoptic_utils.py:6 —
# pan_id = cat_id + ins_id * INSTANCE_OFFSET
INSTANCE_OFFSET = 1000


def panoptic_postprocess(mask_cls: jnp.ndarray, mask_pred: jnp.ndarray,
                         num_things_classes: int = 80,
                         num_stuff_classes: int = 53,
                         object_mask_thr: float = 0.8,
                         iou_thr: float = 0.8,
                         filter_low_score: bool = False) -> jnp.ndarray:
    """Panoptic fusion for ONE image (reference MaskFormerFusionHead.
    panoptic_postprocess, maskformer_fusion_head.py:28-93), vectorized:
    the reference's sequential per-query loop assigns each pixel to the
    query with the highest score-weighted mask probability (queries win
    disjoint pixel sets, so loop order only affects instance-id
    numbering, reproduced here with a cumulative count in query order).

    mask_cls: (Q, C+1) logits incl. background; mask_pred: (Q, H, W)
    logits. Returns an (H, W) int32 map where each element is
    ``label + instance_id * INSTANCE_OFFSET`` for things, ``label`` for
    stuff, and ``num_classes`` for void.
    """
    num_classes = num_things_classes + num_stuff_classes
    probs = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)
    scores = probs.max(axis=-1)
    labels = probs.argmax(axis=-1).astype(jnp.int32)
    masks = jax.nn.sigmoid(mask_pred.astype(jnp.float32))   # (Q, H, W)
    keep = (labels != num_classes) & (scores > object_mask_thr)

    # pixel -> winning query (kept probs are >= 0; non-kept pinned to -1
    # so they can never win; an all-non-kept pixel falls to query 0,
    # which the validity gate below maps to void)
    prob_masks = jnp.where(keep[:, None, None],
                           scores[:, None, None] * masks, -1.0)
    winner = jnp.argmax(prob_masks, axis=0)                 # (H, W)

    q = mask_cls.shape[0]
    # per-query areas: mask_area BEFORE any low-score filtering (the
    # reference computes it from `cur_mask_ids == k` alone, :72-79)
    mask_area = jnp.zeros((q,), jnp.float32).at[winner.ravel()].add(1.0)
    original_area = (masks >= 0.5).sum(axis=(1, 2)).astype(jnp.float32)
    valid = (keep & (mask_area > 0) & (original_area > 0)
             & (mask_area >= iou_thr * original_area))

    is_thing = labels < num_things_classes
    # reference instance ids start at 1 and increment per ASSIGNED thing
    # in query order — an inclusive cumsum over valid things
    inst_id = jnp.cumsum((valid & is_thing).astype(jnp.int32))
    seg_val = jnp.where(is_thing, labels + inst_id * INSTANCE_OFFSET,
                        labels)
    seg_val = jnp.where(valid, seg_val, num_classes).astype(jnp.int32)
    pan = seg_val[winner]                                   # (H, W)
    if filter_low_score:
        # drop a winner's pixels where its own mask prob < 0.5
        win_prob = jnp.take_along_axis(masks, winner[None], axis=0)[0]
        pan = jnp.where(win_prob >= 0.5, pan, num_classes)
    return pan


def semantic_postprocess(mask_cls: jnp.ndarray, mask_pred: jnp.ndarray):
    """Parity stub: the reference's semantic path is itself
    unimplemented (maskformer_fusion_head.py:94-110 raises
    NotImplementedError; simple_test asserts ``semantic_on`` is False,
    :203-205)."""
    raise NotImplementedError(
        'semantic segmentation results are not supported yet '
        '(matches reference maskformer_fusion_head.py:110)')


def instance_postprocess(mask_cls: jnp.ndarray, mask_pred: jnp.ndarray,
                         max_per_image: int = 100) -> Dict[str, jnp.ndarray]:
    """Query outputs -> fixed-capacity instance candidates (reference
    MaskFormerFusionHead.instance_postprocess, the device half):
    flattened (query, class) top-k on softmax scores + the matching mask
    LOGITS. Mask binarization (logits > 0) and mask rescoring happen on
    the host at ORIGINAL resolution (``format_detection``), exactly like
    the reference, which interpolates logits to ori_shape BEFORE
    instance_postprocess (maskformer_fusion_head.py:200-232,112-162).

    mask_cls: (B, Q, C+1); mask_pred: (B, Q, H4, W4) logits.
    """
    b, q, cp1 = mask_cls.shape
    c = cp1 - 1
    scores = jax.nn.softmax(mask_cls, axis=-1)[..., :-1]    # (B, Q, C)
    flat = scores.reshape(b, q * c)
    k = min(max_per_image, q * c)
    top_scores, top_idx = jax.lax.top_k(flat, k)
    labels = (top_idx % c).astype(jnp.int32)
    query_idx = top_idx // c
    masks_logit = jnp.take_along_axis(
        mask_pred, query_idx[..., None, None], axis=1)      # (B, k, H, W)
    return dict(scores=top_scores, labels=labels,
                masks_logit=masks_logit,
                valid=jnp.ones_like(top_scores, bool))


@DETECTORS.register_module()
class MaskFormer(nn.Module):
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    panoptic_head: Optional[dict] = None
    panoptic_fusion_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    def setup(self):
        self.backbone_m = BACKBONES.build(self.backbone)
        self.neck_m = NECKS.build(self.neck) if self.neck else None
        head_cfg = dict(self.panoptic_head)
        head_cfg['train_cfg'] = self.train_cfg
        head_cfg['test_cfg'] = self.test_cfg
        self.panoptic_head_m = HEADS.build(head_cfg)

    def extract_feat(self, images, train: bool = False):
        x = self.backbone_m(images, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x, train=train)
        return x

    def __call__(self, images, train: bool = False):
        feats = self.extract_feat(images, train=train)
        return self.panoptic_head_m(feats, train=train)

    def loss(self, batch: Dict[str, jnp.ndarray], iteration: jnp.ndarray
             ) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=True)
        # force_fp32 boundary: heads may run bf16; losses are f32
        outs = f32_tree(self.panoptic_head_m(feats, train=True))
        return self.panoptic_head_m.loss(outs, batch)

    def predict(self, batch: Dict[str, jnp.ndarray]
                ) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=False)
        outs = self.panoptic_head_m(feats, train=False)
        test_cfg = dict(self.test_cfg or {})
        max_per_image = int(test_cfg.get('max_per_image', 100))
        out = instance_postprocess(outs['cls'][-1], outs['masks'][-1],
                                   max_per_image)
        if test_cfg.get('panoptic_on', False):
            # raw per-query outputs ride along so the host can finish
            # the panoptic fusion at original resolution (reference
            # simple_test interpolates logits to ori_shape BEFORE
            # panoptic_postprocess, maskformer_fusion_head.py:211-226)
            out['pan_cls'] = outs['cls'][-1]
            out['pan_masks_logit'] = outs['masks'][-1]
        return out


@DETECTORS.register_module()
class Box2Mask(MaskFormer):
    """Thin alias (reference: box2mask.py:6)."""
