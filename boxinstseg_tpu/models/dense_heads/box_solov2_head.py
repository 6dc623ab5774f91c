"""BoxLevelset head: SOLOv2-style grid head with level-set losses.

Capability-parity rebuild of the reference head (reference:
mmdet/models/dense_heads/box_solov2_head.py, 595 LoC) redesigned for TPU:

- per-grid dynamic masks decode as one batched einsum over the unified
  stride-4 mask feature instead of ``F.conv2d(groups=N)``
  (box_solov2_head.py:209-216);
- target assignment is the batched ``solo_targets`` (device mass centers;
  no scipy/imrescale host hops, cf. box_solov2_head.py:444,460);
- instance losses are computed at a single static resolution for all
  levels (the reference computes them per level resolution) with a fixed
  positive capacity;
- the Chan-Vese level-set losses follow the reference weighting: box
  projection x loss_weight, image level-set x0.05, tree-filtered
  structural level-set x5.0 (box_solov2_head.py:334-364), with the tree
  filter evaluated at a fixed ``tf_size`` (the same trick Box2Mask uses at
  96x96, models/utils/misc.py:75-86).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..layers import Conv2d, ConvModule, normal_conv_init, \
    bias_init_with_prob
from ..losses.levelset_loss import (region_levelset,
                                    region_levelset_shared)
from ...core.targets.solo import sample_positive_cells, solo_targets
from ...ops.nms import mask_matrix_nms, points_nms_2x2
from ...ops.upsample import interpolate_bilinear
from ...ops.tree_filter import (grid_mst, grid_mst_pair,
                                tree_filter2d)
from ...registry import HEADS, LOSSES


def _coord_feat(b, h, w):
    """2-channel [-1, 1] coordinate feature, (B, H, W, 2), x then y."""
    xs = jnp.linspace(-1.0, 1.0, w)
    ys = jnp.linspace(-1.0, 1.0, h)
    x = jnp.broadcast_to(xs[None, None, :], (b, h, w))
    y = jnp.broadcast_to(ys[None, :, None], (b, h, w))
    return jnp.stack([x, y], axis=-1)


@HEADS.register_module()
class BoxSOLOv2Head(nn.Module):
    num_classes: int
    in_channels: int = 256
    seg_feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 8, 16, 32, 32)
    base_edge_list: Sequence[int] = (16, 32, 64, 128, 256)
    scale_ranges: Sequence = ((1, 96), (48, 192), (96, 384), (192, 768),
                              (384, 2048))
    sigma: float = 0.2
    num_grids: Sequence[int] = (40, 36, 24, 16, 12)
    cate_down_pos: int = 0
    loss_cate: Optional[dict] = None
    loss_boxpro: Optional[dict] = None
    loss_levelset: Optional[dict] = None
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    use_dcn_in_tower: bool = False
    type_dcn: Optional[str] = None
    init_cfg: Optional[dict] = None
    # TPU-specific static knobs
    max_pos: int = 196            # positive-cell capacity per image
    tf_size: Tuple[int, int] = (96, 96)
    tf_max_depth: int = 0
    levelset_feat_channels: int = 5

    @property
    def num_cells(self) -> int:
        return int(sum(s * s for s in self.num_grids))

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: FPN P2..P6 (B, H, W, C) NHWC.

        Returns dict with:
          kernels: (B, Pc, E) flattened level-major per-grid kernels;
          cates: (B, Pc, num_classes) logits (eval: sigmoid+points-nms'd);
          mask_feat: (B, H4, W4, E) unified stride-4 feature;
          levelset_feat: (B, H4, W4, 5).
        """
        gn = dict(type='GN',
                  num_groups=min(32, self.seg_feat_channels))
        init01 = normal_conv_init(0.01)
        b = feats[0].shape[0]

        # --- split_feats: P2 halved, P6 resized to P5 size
        # (reference box_solov2_head.py:219-224)
        p2h, p2w = feats[0].shape[1:3]
        new_feats = [
            interpolate_bilinear(feats[0], (p2h // 2, p2w // 2)),
            feats[1], feats[2], feats[3],
            interpolate_bilinear(feats[4], feats[3].shape[1:3]),
        ]

        # tower deformable-conv option (reference box_solov2_head.py:68-69)
        _dcn = self.type_dcn if self.use_dcn_in_tower else None
        kernel_convs = [
            ConvModule(self.seg_feat_channels, 3, 1, 1, norm_cfg=gn,
                       use_bias=False, kernel_init=init01,
                       conv_type=_dcn, name=f'kernel_conv_{i}')
            for i in range(self.stacked_convs)
        ]
        cate_convs = [
            ConvModule(self.seg_feat_channels, 3, 1, 1, norm_cfg=gn,
                       use_bias=False, kernel_init=init01,
                       conv_type=_dcn, name=f'cate_conv_{i}')
            for i in range(self.stacked_convs)
        ]
        solo_cate = Conv2d(self.num_classes, 3, 1, 1, kernel_init=init01,
                           bias_init=bias_init_with_prob(0.01),
                           name='solo_cate')
        solo_kernel = Conv2d(self.seg_feat_channels, 1, 1, 0,
                             kernel_init=init01, name='solo_kernel')

        kernels, cates = [], []
        for lvl, x in enumerate(new_feats):
            s = self.num_grids[lvl]
            coord = _coord_feat(b, x.shape[1], x.shape[2])
            kfeat = jnp.concatenate([x, coord], axis=-1)
            cfeat = x
            for i in range(self.stacked_convs):
                if i == self.cate_down_pos:
                    kfeat = interpolate_bilinear(kfeat, (s, s))
                    cfeat = interpolate_bilinear(cfeat, (s, s))
                kfeat = kernel_convs[i](kfeat, train=train)
                cfeat = cate_convs[i](cfeat, train=train)
            kernel_pred = solo_kernel(kfeat)                 # (B, S, S, E)
            cate_pred = solo_cate(cfeat)                     # (B, S, S, C)
            if not train:
                cate_pred = jax.nn.sigmoid(cate_pred)
                # 2x2 points NMS on the grid heatmap (reference :255-259)
                cate_pred = points_nms_2x2(
                    cate_pred.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
            kernels.append(kernel_pred.reshape(b, s * s, -1))
            cates.append(cate_pred.reshape(b, s * s, -1))

        # --- unified mask feature from P2..P5 at stride 4
        # (reference :184-200: i upsample stages per level, coord on P5)
        feat_sum = None
        target_hw = feats[0].shape[1:3]
        for i in range(4):
            x = feats[i]
            if i == 3:
                x = jnp.concatenate(
                    [x, _coord_feat(b, x.shape[1], x.shape[2])], axis=-1)
            n_convs = max(i, 1)
            for j in range(n_convs):
                # feature convs: no norm, no bias (reference quirk:
                # `bias=norm_cfg is None` with the local GN dict)
                x = ConvModule(self.seg_feat_channels, 3, 1, 1,
                               norm_cfg=None, use_bias=False,
                               kernel_init=init01,
                               conv_type=_dcn,
                               name=f'feature_conv_{i}_{j}')(x, train=train)
                if i > 0:  # conv followed by x2 bilinear upsample
                    x = interpolate_bilinear(
                        x, (x.shape[1] * 2, x.shape[2] * 2))
            if x.shape[1:3] != tuple(target_hw):
                x = interpolate_bilinear(x, target_hw)
            feat_sum = x if feat_sum is None else feat_sum + x
        mask_feat = Conv2d(self.seg_feat_channels, 1, 1, 0,
                           kernel_init=init01, name='solo_mask')(feat_sum)
        levelset_feat = Conv2d(self.levelset_feat_channels, 3, 1, 1,
                               kernel_init=init01,
                               name='levelset_bottom')(mask_feat)

        return dict(kernels=jnp.concatenate(kernels, axis=1),
                    cates=jnp.concatenate(cates, axis=1),
                    mask_feat=mask_feat,
                    levelset_feat=levelset_feat)

    # ---------------------------------------------------------------- decode
    def decode_masks(self, mask_feat: jnp.ndarray, kernels: jnp.ndarray
                     ) -> jnp.ndarray:
        """(B, H4, W4, E) x (B, K, E) -> (B, K, H4, W4) mask logits."""
        return jnp.einsum('bhwe,bke->bkhw', mask_feat, kernels,
                          preferred_element_type=jnp.float32)

    # ------------------------------------------------------------------ loss
    def loss(self, outs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
             ) -> Dict[str, jnp.ndarray]:
        """batch needs: image, gt_bboxes, gt_labels, gt_valid,
        gt_masks (B, G, H4, W4) box bitmasks at stride 4."""
        loss_cate_fn = LOSSES.build(self.loss_cate or dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0))
        loss_boxpro_fn = LOSSES.build(self.loss_boxpro or dict(
            type='BoxProjectionLoss', loss_weight=3.0))
        levelset_weight = (self.loss_levelset or {}).get('loss_weight', 1.0)

        B, H, W, _ = batch['image'].shape
        targets = solo_targets(
            batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
            batch['gt_masks'], (H, W), self.num_grids, self.scale_ranges,
            self.sigma, self.num_classes, mask_stride=4)

        num_pos = targets.num_pos.astype(jnp.float32)
        loss_cate = loss_cate_fn(outs['cates'], targets.cate_labels,
                                 avg_factor=num_pos + 1.0)

        cell_idx, gt_idx, valid = sample_positive_cells(
            targets.cell_gt, self.max_pos)
        kernels = jnp.take_along_axis(outs['kernels'], cell_idx[..., None],
                                      axis=1)                    # (B,K,E)
        mask_logits = self.decode_masks(outs['mask_feat'], kernels)
        K = mask_logits.shape[1]
        h4, w4 = mask_logits.shape[2:]

        box_mask = jnp.take_along_axis(
            batch['gt_masks'].astype(jnp.float32),
            gt_idx[..., None, None], axis=1)                     # (B,K,H4,W4)
        box_mask = jax.lax.stop_gradient(box_mask)
        vmask = valid.astype(jnp.float32)

        mask_scores = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
        # --- projection loss (per instance, masked mean; reference
        # weights it via loss_weight and takes the mean)
        prj = loss_boxpro_fn(
            mask_scores.reshape(B * K, h4, w4),
            box_mask.reshape(B * K, h4, w4),
            valid=valid.reshape(-1))
        loss_project = prj.sum() / jnp.maximum(vmask.sum(), 1.0)

        # --- level-set losses
        pixel_num = jnp.maximum(box_mask.sum(axis=(2, 3)), 1.0)  # (B,K)

        # image term x0.05 at stride 4 — shared-target einsum form (no
        # (B, K, 3, h, w) materialization; see region_levelset_shared)
        img_t = jax.lax.stop_gradient(
            interpolate_bilinear(batch['image'], (h4, w4)))
        img_t = img_t.transpose(0, 3, 1, 2)                      # (B,3,h,w)
        ls_img = region_levelset_shared(mask_scores, box_mask,
                                        img_t) / pixel_num
        ls_img = (ls_img * vmask).reshape(-1)

        # tree-filtered structural term x5.0 at tf_size
        th, tw = self.tf_size
        img_tf = jax.lax.stop_gradient(
            interpolate_bilinear(batch['image'], (th, tw)))       # (B,t,t,3)
        lst_tf = interpolate_bilinear(outs['levelset_feat'], (th, tw))
        mask_tf = interpolate_bilinear(
            mask_scores.transpose(0, 2, 3, 1), (th, tw))          # (B,t,t,K)
        box_tf = jax.lax.stop_gradient(interpolate_bilinear(
            box_mask.transpose(0, 2, 3, 1), (th, tw)))            # (B,t,t,K)

        # 0 = full-grid depth budget (reference parity: refine.cu has
        # no depth cap); the doubling passes early-exit at the real depth
        tf_md = self.tf_max_depth or th * tw
        (parent_i, depth_i), (parent_l, depth_l) = grid_mst_pair(
            img_tf, lst_tf, tf_md)
        deep_img = tree_filter2d(mask_tf, img_tf, parent_i, depth_i,
                                 sigma=0.02, low_tree=True,
                                 max_depth=tf_md)
        deep_lst = tree_filter2d(deep_img, lst_tf, parent_l, depth_l,
                                 low_tree=False,
                                 max_depth=tf_md)
        # (B, t, t, K) -> per-instance 2-channel structural features
        high = jnp.stack([deep_img, deep_lst], axis=1)            # (B,2,t,t,K)
        high = high.transpose(0, 4, 1, 2, 3) * box_tf.transpose(
            0, 3, 1, 2)[:, :, None]                               # (B,K,2,t,t)

        mask_tf_bk = mask_tf.transpose(0, 3, 1, 2)                # (B,K,t,t)
        box_tf_bk = box_tf.transpose(0, 3, 1, 2)
        phi_tf = jnp.stack([mask_tf_bk, 1.0 - mask_tf_bk],
                           axis=2) * box_tf_bk[:, :, None]        # (B,K,2,t,t)
        pixel_tf = jnp.maximum(box_tf_bk.sum(axis=(2, 3)), 1.0)
        ls_high = region_levelset(
            phi_tf.reshape(B * K, 2, th, tw),
            high.reshape(B * K, 2, th, tw)) / pixel_tf.reshape(-1)
        ls_high = ls_high * vmask.reshape(-1)

        denom = jnp.maximum(vmask.sum(), 1.0)
        loss_levelset = levelset_weight * (
            0.05 * ls_img.sum() + 5.0 * ls_high.sum()) / denom

        return dict(loss_cate=loss_cate, loss_boxpro=loss_project,
                    loss_levelset=loss_levelset)

    # ------------------------------------------------------------- inference
    def get_seg(self, outs: Dict[str, jnp.ndarray], test_cfg: Dict
                ) -> Dict[str, jnp.ndarray]:
        """Static-shape SOLO decoding (reference get_seg_single,
        box_solov2_head.py:503-590): threshold -> top nms_pre kernels ->
        decode -> area filter -> mask rescoring -> matrix NMS -> top
        max_per_img. Returns stride-4 mask scores + labels/scores/valid.
        """
        cfg = dict(test_cfg or {})
        score_thr = float(cfg.get('score_thr', 0.05))
        mask_thr = float(cfg.get('mask_thr', 0.55))
        filter_thr = float(cfg.get('filter_thr', 0.025))
        nms_pre = int(cfg.get('nms_pre', 500))
        max_per_img = int(cfg.get('max_per_img', 100))
        kernel = cfg.get('kernel', 'gaussian')
        sigma = float(cfg.get('sigma', 2.0))

        cates = outs['cates']                       # (B, Pc, C) sigmoid'd
        B, Pc, C = cates.shape
        # per-cell stride (for the min-area filter)
        strides = np.concatenate([
            np.full(s * s, st, np.float32)
            for s, st in zip(self.num_grids, self.strides)])
        strides = jnp.asarray(strides)

        flat = jnp.where(cates > score_thr, cates, 0.0).reshape(B, Pc * C)
        top_scores, top_idx = jax.lax.top_k(flat, min(nms_pre, Pc * C))
        cell = top_idx // C
        labels = (top_idx % C).astype(jnp.int32)

        kernels = jnp.take_along_axis(outs['kernels'], cell[..., None],
                                      axis=1)
        masks_logit = self.decode_masks(outs['mask_feat'], kernels)
        mask_scores = jax.nn.sigmoid(masks_logit)   # (B, N, H4, W4)
        seg_masks = (mask_scores > mask_thr).astype(jnp.float32)
        sum_masks = seg_masks.sum(axis=(2, 3))
        cell_stride = strides[cell]
        keep = (sum_masks > cell_stride) & (top_scores > 0)

        # mask rescoring
        seg_score = (mask_scores * seg_masks).sum(axis=(2, 3)) / \
            jnp.maximum(sum_masks, 1e-6)
        scores = jnp.where(keep, top_scores * seg_score, 0.0)

        new_scores = jax.vmap(
            lambda m, l, s, v: mask_matrix_nms(m, l, s, v, kernel=kernel,
                                               sigma=sigma))(
            seg_masks, labels, scores, keep)
        new_scores = jnp.where(new_scores > filter_thr, new_scores, 0.0)

        final_scores, order = jax.lax.top_k(new_scores,
                                            min(max_per_img, Pc))
        final_labels = jnp.take_along_axis(labels, order, axis=1)
        final_masks = jnp.take_along_axis(
            mask_scores, order[..., None, None], axis=1)
        valid = final_scores > 0
        return dict(scores=final_scores, labels=final_labels,
                    masks=final_masks, valid=valid)
