"""CondInst/BoxInst detector (reference: mmdet/models/detectors/condinst.py).

One flax module orchestrating backbone -> FPN -> box head -> mask branch ->
dynamic mask head. ``loss`` implements the full BoxInst training objective
on a static-shape batch; ``predict`` is the jittable inference path emitting
fixed-capacity detections + stride-4 mask scores (final per-image resize to
original resolution happens host-side in the eval API, mirroring the
reference's GPU->CPU handoff at condinst_head.py:1281-1283).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..dense_heads.condinst_head import CondInstBoxHead
from ...core.targets.fcos import sample_positives_per_gt
from ...ops.boxes import distance2bbox
from ...ops.nms import greedy_nms
from ...registry import (BACKBONES, DETECTORS, HEADS, NECKS)
from ..layers import f32_tree

DEFAULT_MEAN = (123.675, 116.28, 103.53)
DEFAULT_STD = (58.395, 57.12, 57.375)


@DETECTORS.register_module()
class CondInst(nn.Module):
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    bbox_head: Optional[dict] = None
    mask_branch: Optional[dict] = None
    mask_head: Optional[dict] = None
    segm_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    img_norm_mean: Sequence[float] = DEFAULT_MEAN
    img_norm_std: Sequence[float] = DEFAULT_STD
    remat_mask_head: bool = False

    def setup(self):
        self.backbone_m = BACKBONES.build(self.backbone)
        self.neck_m = NECKS.build(self.neck) if self.neck else None
        self.mask_head_m = HEADS.build(self.mask_head)
        self.segm_head_m = HEADS.build(self.segm_head) \
            if self.segm_head else None
        bbox_cfg = dict(self.bbox_head)
        bbox_cfg['num_gen_params'] = self.mask_head_m.num_gen_params
        self.bbox_head_m = HEADS.build(bbox_cfg)
        self.mask_branch_m = HEADS.build(self.mask_branch)

    def extract_feat(self, images, train: bool = False):
        x = self.backbone_m(images, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x, train=train)
        return x

    def __call__(self, images, train: bool = False):
        """Plain forward (feature + head outputs), used for compile checks."""
        feats = self.extract_feat(images, train=train)
        outs = self.bbox_head_m(feats, train=train)
        mask_feat = self.mask_branch_m(feats, train=train)
        return outs, mask_feat

    # ------------------------------------------------------------------ train
    def loss(self, batch: Dict[str, jnp.ndarray], iteration: jnp.ndarray
             ) -> Dict[str, jnp.ndarray]:
        """Full BoxInst training losses on one (global) batch.

        batch keys: image (B,H,W,3) normalized RGB; img_shape (B,2);
        pixels_removed (B,); gt_bboxes (B,G,4); gt_labels (B,G);
        gt_valid (B,G).
        """
        feats = self.extract_feat(batch['image'], train=True)
        # force_fp32 boundary: heads may run bf16; losses are f32
        outs = f32_tree(self.bbox_head_m(feats, train=True))
        losses, targets, pts = self.bbox_head_m.loss(
            outs, batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'])

        mask_feat = f32_tree(self.mask_branch_m(feats, train=True))

        if self.segm_head_m is not None and 'gt_masks' in batch:
            segm_pred = f32_tree(self.segm_head_m(feats[0], train=True))
            losses.update(self.segm_head_m.loss(
                segm_pred, batch['gt_masks'], batch['gt_labels'],
                batch['gt_valid']))

        # --- fixed-capacity positive sampling (reference training_sample,
        # condinst_head.py:1166-1232)
        cls = CondInstBoxHead.flatten_levels(outs['cls'])
        ctr = CondInstBoxHead.flatten_levels(outs['ctr'])[..., 0]
        score = jax.nn.sigmoid(cls).max(-1) * jax.nn.sigmoid(ctr)
        score = jax.lax.stop_gradient(score)
        point_idx, sample_gt, sample_valid = sample_positives_per_gt(
            score, targets.gt_inds, batch['gt_valid'],
            self.mask_head_m.capacity)

        params_flat = CondInstBoxHead.flatten_levels(outs['param'])
        params = jnp.take_along_axis(params_flat, point_idx[..., None],
                                     axis=1)                    # (B,K,Np)
        coors = pts['points'][point_idx]                        # (B,K,2)
        levels = pts['level_inds'][point_idx]                   # (B,K)
        boxes = jnp.take_along_axis(batch['gt_bboxes'],
                                    sample_gt[..., None], axis=1)

        decode = self.mask_head_m.decode
        if self.remat_mask_head:
            # rematerialize the (B, K, Hm, Wm, C) dynamic-conv
            # intermediates in the backward pass — trades ~2 GB of HBM
            # for a cheap recompute, enabling larger per-chip batches
            decode = jax.checkpoint(decode)
        mask_logits = decode(mask_feat, params, coors, levels)
        if self.mask_head_m.boxinst_enabled:
            sim, _ = self.mask_head_m.color_similarity_targets(
                batch['image'], self.img_norm_mean, self.img_norm_std,
                batch['img_shape'], batch['pixels_removed'])
            sim = jax.lax.stop_gradient(sim)
            mask_losses = self.mask_head_m.loss(
                mask_logits, boxes, sample_valid, sim, iteration)
        else:
            # fully-supervised CondInst: dice vs. GT masks
            from ..losses.dice_loss import dice_coefficient
            gt_masks = batch['gt_masks']      # (B, G, H, W) binary, stride 1
            start = self.mask_head_m.out_stride // 2
            s = self.mask_head_m.out_stride
            tgt = gt_masks[:, :, start::s, start::s]
            tgt = jnp.take_along_axis(
                tgt, sample_gt[..., None, None], axis=1).astype(jnp.float32)
            scores = jax.nn.sigmoid(mask_logits)
            b, k = scores.shape[:2]
            d = dice_coefficient(scores.reshape(b * k, -1),
                                 tgt.reshape(b * k, -1))
            v = sample_valid.reshape(-1).astype(jnp.float32)
            mask_losses = dict(
                loss_mask=(d * v).sum() / jnp.maximum(v.sum(), 1.0))
        losses.update(mask_losses)
        return losses

    # -------------------------------------------------------------- inference
    def predict(self, batch: Dict[str, jnp.ndarray], rescale: bool = True
                ) -> Dict[str, jnp.ndarray]:
        """Static-shape detection + mask decode.

        batch keys: image, img_shape (B,2), scale_factor (B,4).
        Returns dict with bboxes (B,D,4), scores (B,D), labels (B,D),
        valid (B,D), masks (B,D,H/4,W/4) sigmoid scores on the padded
        canvas (host crops/rescales).
        """
        test_cfg = dict(self.test_cfg or {})
        nms_pre = int(test_cfg.get('nms_pre', 1000))
        score_thr = float(test_cfg.get('score_thr', 0.05))
        iou_thr = float(test_cfg.get('nms', {}).get('iou_threshold', 0.5))
        pre_nms_limit = int(test_cfg.get('pre_nms_limit', 1000))
        max_det = int(min(test_cfg.get('max_per_img', 100),
                          test_cfg.get('post_nms_top_k', 100)))

        feats = self.extract_feat(batch['image'], train=False)
        outs = self.bbox_head_m(feats, train=False)
        mask_feat = self.mask_branch_m(feats, train=False)

        featmap_sizes = [x.shape[1:3] for x in outs['cls']]
        pts = self.bbox_head_m.points_meta(featmap_sizes)

        B = batch['image'].shape[0]
        C = self.bbox_head_m.num_classes
        img_shape = batch['img_shape'].astype(jnp.float32)    # (B, 2) h,w

        lvl_scores, lvl_boxes, lvl_ctr, lvl_params = [], [], [], []
        lvl_coors, lvl_levels = [], []
        offset = 0
        for lvl in range(len(featmap_sizes)):
            h, w = featmap_sizes[lvl]
            hw = h * w
            cls = outs['cls'][lvl].reshape(B, hw, C)
            bbox = outs['bbox'][lvl].reshape(B, hw, 4)
            ctr = outs['ctr'][lvl].reshape(B, hw)
            par = outs['param'][lvl].reshape(B, hw, -1)
            pts_l = pts['points'][offset:offset + hw]
            offset += hw

            scores = jax.nn.sigmoid(cls)
            ctr_s = jax.nn.sigmoid(ctr)
            k = min(nms_pre, hw)
            rank = (scores * ctr_s[..., None]).max(-1)
            _, top = jax.lax.top_k(rank, k)                   # (B, k)
            take = lambda a: jnp.take_along_axis(
                a, top[..., None] if a.ndim == 3 else top, axis=1)
            scores = take(scores)
            bbox = take(bbox)
            ctr_s = take(ctr_s)
            par = take(par)
            points = pts_l[top]                               # (B, k, 2)
            boxes = distance2bbox(points, bbox,
                                  max_shape=img_shape[:, None, :])
            lvl_scores.append(scores)
            lvl_boxes.append(boxes)
            lvl_ctr.append(ctr_s)
            lvl_params.append(par)
            lvl_coors.append(points)
            lvl_levels.append(jnp.full((B, k), lvl, jnp.int32))

        scores = jnp.concatenate(lvl_scores, 1)               # (B, Pc, C)
        boxes = jnp.concatenate(lvl_boxes, 1)
        ctr_s = jnp.concatenate(lvl_ctr, 1)
        params = jnp.concatenate(lvl_params, 1)
        coors = jnp.concatenate(lvl_coors, 1)
        levels = jnp.concatenate(lvl_levels, 1)
        pc = scores.shape[1]

        cand = scores * ctr_s[..., None]
        cand = jnp.where(scores > score_thr, cand, 0.0)       # (B, Pc, C)
        flat = cand.reshape(B, pc * C)
        n_cand = min(pre_nms_limit, pc * C)
        cand_scores, cand_idx = jax.lax.top_k(flat, n_cand)   # (B, N)
        box_idx = cand_idx // C
        cand_labels = (cand_idx % C).astype(jnp.int32)
        cand_boxes = jnp.take_along_axis(boxes, box_idx[..., None], axis=1)

        keep_idx, keep_valid = jax.vmap(
            lambda b, s, l: greedy_nms(b, s, l, iou_thr, max_det))(
            cand_boxes, cand_scores, cand_labels)

        def gather(a, idx):
            if a.ndim == 2:
                return jnp.take_along_axis(a, idx, axis=1)
            return jnp.take_along_axis(a, idx[..., None], axis=1)

        det_scores = gather(cand_scores, keep_idx) * keep_valid
        det_labels = gather(cand_labels, keep_idx)
        det_boxes = gather(cand_boxes, keep_idx)
        det_box_idx = gather(box_idx, keep_idx)               # into Pc
        det_params = jnp.take_along_axis(params, det_box_idx[..., None], 1)
        det_coors = jnp.take_along_axis(coors, det_box_idx[..., None], 1)
        det_levels = jnp.take_along_axis(levels, det_box_idx, 1)

        mask_logits = self.mask_head_m.decode(
            mask_feat, det_params, det_coors, det_levels)     # (B,D,H4,W4)
        masks = jax.nn.sigmoid(mask_logits)

        if rescale and 'scale_factor' in batch:
            det_boxes = det_boxes / batch['scale_factor'][:, None, :]
        return dict(bboxes=det_boxes, scores=det_scores, labels=det_labels,
                    valid=keep_valid, masks=masks)
