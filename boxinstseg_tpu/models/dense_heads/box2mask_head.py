"""Box2Mask head: masked-attention transformer decoder with
box-supervised level-set losses.

Capability-parity rebuild of the reference (reference:
mmdet/models/dense_heads/box2mask_head.py, 460 LoC) redesigned for TPU:

- MSDeformAttn pixel decoder + 9-layer masked-attention decoder with
  learned query feat/pos and level embeddings (box2mask_head.py:62-105,
  361-419), all static (B, Q, C) batch-first einsums;
- per-layer ``forward_head`` (cls / mask-embed x mask-feature einsum /
  attention mask / levelset feature, :338-359);
- Hungarian matching (ClassificationCost + BoxMatchingCost) with the
  batched device cost matrix and one host linear_sum_assignment callback
  (core/targets/hungarian.py) instead of a per-image scipy loop
  (mask_hungarian_assigner.py:113-123);
- deep supervision over all 10 outputs (:192-221): CE cls (bg weight
  0.1), BoxProjectionLoss x5, image level-set x0.05, tree-filtered
  structural level-set x5 at 96x96 (_scale_target, misc.py:75-86), LCM
  x0.2 — matched masks of all layers are filtered through the per-image
  trees in ONE batched tree-filter call.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..layers import Conv2d, Dense, LayerNorm
from ..losses.levelset_loss import (LocalConsistencyModule,
                                    region_levelset,
                                    region_levelset_shared)
from ..plugins.msdeformattn_pixel_decoder import MSDeformAttnPixelDecoder
from ..utils.positional_encoding import SinePositionalEncoding
from ..utils.transformer import DetrTransformerDecoderLayer
from ...core.targets.hungarian import (box_matching_cost,
                                       classification_cost, hungarian_match)
from ...ops.tree_filter import (grid_mst, grid_mst_pair,
                                tree_filter2d)
from ...ops.upsample import interpolate_bilinear
from ...registry import HEADS


@HEADS.register_module()
class Box2MaskHead(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    strides: Sequence[int] = (4, 8, 16, 32)
    feat_channels: int = 256
    out_channels: int = 256
    num_things_classes: int = 80
    num_stuff_classes: int = 0
    num_queries: int = 100
    num_transformer_feat_level: int = 3
    pixel_decoder: Optional[dict] = None
    enforce_decoder_input_project: bool = False
    transformer_decoder: Optional[dict] = None
    positional_encoding: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_box: Optional[dict] = None
    loss_mask: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    # TPU-specific static knobs
    # matched-GT capacity per image; >= max_gts so every padded GT can be
    # matched, like the reference's full Hungarian solve over all GTs
    # (reference mask_hungarian_assigner.py:113-123; COCO crowded images
    # reach ~93 instances)
    max_matched: int = 100
    tf_size: Tuple[int, int] = (96, 96)
    tf_max_depth: int = 0

    @property
    def num_classes(self):
        return self.num_things_classes + self.num_stuff_classes

    def _decoder_cfg(self):
        td = self.transformer_decoder or {}
        layers = td.get('num_layers', 9)
        tl = td.get('transformerlayers', {})
        heads = (tl.get('attn_cfgs') or {}).get('num_heads', 8)
        ffc = tl.get('feedforward_channels', 2048)
        return layers, heads, ffc

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: (C2..C5) NHWC. Returns lists over 10 head applications:
        cls (B, Q, C+1), masks (B, Q, H4, W4), plus the shared
        levelset_feat (B, H4, W4, 1)."""
        num_layers, num_heads, ffc = self._decoder_cfg()
        nfl = self.num_transformer_feat_level
        q = self.num_queries
        c = self.feat_channels

        pd_cfg = {k: v for k, v in dict(self.pixel_decoder or {}).items()
                  if k in ('num_outs', 'num_encoder_layers')}
        pixel_decoder = MSDeformAttnPixelDecoder(
            in_channels=self.in_channels, strides=self.strides,
            feat_channels=c, out_channels=self.out_channels,
            name='pixel_decoder', **pd_cfg)
        mask_features, memories = pixel_decoder(feats, train=train)

        pe = SinePositionalEncoding(num_feats=c // 2, normalize=True)
        level_embed = self.param('level_embed',
                                 nn.initializers.normal(1.0), (nfl, c))
        query_feat = self.param('query_feat',
                                nn.initializers.normal(1.0), (q, c))
        query_embed = self.param('query_embed',
                                 nn.initializers.normal(1.0), (q, c))

        b = feats[0].shape[0]
        dec_inputs, dec_pos, dec_hw = [], [], []
        for i in range(nfl):
            m = memories[i]
            h, w = m.shape[1:3]
            dec_inputs.append(m.reshape(b, h * w, c) + level_embed[i])
            dec_pos.append(pe(b, h, w).reshape(b, h * w, c))
            dec_hw.append((h, w))

        post_norm = LayerNorm(name='post_norm')
        cls_embed = Dense(self.num_classes + 1, name='cls_embed')
        mask_mlp = [Dense(c, name=f'mask_embed_{i}') for i in range(2)]
        mask_out = Dense(self.out_channels, name='mask_embed_out')
        levelset_bottom = Conv2d(1, 3, 1, 1, name='levelset_bottom')

        def forward_head(query, target_hw):
            out = post_norm(query)
            cls_pred = cls_embed(out)
            me = out
            for fc in mask_mlp:
                me = jax.nn.relu(fc(me))
            me = mask_out(me)                             # (B, Q, C)
            mask_pred = jnp.einsum('bqc,bhwc->bqhw', me, mask_features,
                                   preferred_element_type=jnp.float32)
            am = interpolate_bilinear(
                mask_pred.transpose(0, 2, 3, 1), target_hw).transpose(
                0, 3, 1, 2)                                  # (B,Q,h,w)
            am = (jax.nn.sigmoid(am) < 0.5).reshape(b, q, -1)
            # a fully-masked row would block everything; unblock it
            all_true = am.all(axis=-1, keepdims=True)
            am = am & (~all_true)
            am = jax.lax.stop_gradient(
                jnp.broadcast_to(am[:, None], (b, num_heads, q,
                                               am.shape[-1])))
            return cls_pred, me, mask_pred, am

        levelset_feat = levelset_bottom(mask_features)

        queries = jnp.broadcast_to(query_feat[None], (b, q, c))
        qpos = jnp.broadcast_to(query_embed[None], (b, q, c))

        # only mask EMBEDDINGS (B, Q, C) are kept per layer; the loss
        # reconstructs full-resolution mask logits lazily inside a
        # rematerialized per-layer body — 10 live (B, Q, H4, W4) buffers
        # at LSJ sizes exceeded HBM (and crashed the compiler) at batch 2
        cls_list, embed_list = [], []
        cls_pred, me, mask_pred, attn_mask = forward_head(queries,
                                                          dec_hw[0])
        cls_list.append(cls_pred)
        embed_list.append(me)
        for i in range(num_layers):
            lvl = i % nfl
            queries = DetrTransformerDecoderLayer(
                c, num_heads, ffc, name=f'decoder_layer_{i}')(
                queries, dec_inputs[lvl], dec_inputs[lvl], qpos,
                dec_pos[lvl], cross_attn_mask=attn_mask)
            cls_pred, me, mask_pred, attn_mask = forward_head(
                queries, dec_hw[(i + 1) % nfl])
            cls_list.append(cls_pred)
            embed_list.append(me)
        return dict(cls=cls_list, mask_embeds=embed_list,
                    masks=[mask_pred],            # final layer only
                    mask_feature=mask_features,
                    levelset_feat=levelset_feat)

    # ------------------------------------------------------------------ loss
    def loss(self, outs: Dict, batch: Dict[str, jnp.ndarray]
             ) -> Dict[str, jnp.ndarray]:
        """batch: image, gt_labels (B, G), gt_valid, gt_masks (B, G, H4, W4)
        box bitmasks at the mask-feature stride."""
        cls_w = (self.loss_cls or {}).get('loss_weight', 2.0)
        bg_w = 0.1
        cw = np.ones(self.num_classes + 1, np.float32)
        cw[-1] = bg_w
        cls_cost_w = ((self.train_cfg or {}).get('assigner', {})
                      .get('cls_cost', {}).get('weight', 2.0))
        dice_cost_w = ((self.train_cfg or {}).get('assigner', {})
                       .get('dice_cost', {}).get('weight', 5.0))
        box_w = (self.loss_box or {}).get('loss_weight', 5.0)
        ls_w = (self.loss_mask or {}).get('loss_weight', 1.0)

        gt_labels = batch['gt_labels']
        gt_valid = batch['gt_valid']
        gt_masks = batch['gt_masks'].astype(jnp.float32)
        B, G = gt_labels.shape
        K = min(self.max_matched, G)
        h4, w4 = outs['mask_feature'].shape[1:3]
        class_weight = jnp.asarray(cw)

        # sample a fixed-capacity subset of GTs per image (slot order)
        order = jnp.argsort(~gt_valid, axis=1, stable=True)[:, :K]
        k_valid = jnp.take_along_axis(gt_valid, order, axis=1)
        k_labels = jnp.take_along_axis(gt_labels, order, axis=1)
        k_masks = jnp.take_along_axis(gt_masks, order[..., None, None],
                                      axis=1)                 # (B,K,H4,W4)
        k_maskf = jax.lax.stop_gradient(k_masks)
        vmask = k_valid.astype(jnp.float32)
        denom = jnp.maximum(vmask.sum(), 1.0)

        # shared per-image structures for the tree/LCM terms
        th, tw = self.tf_size
        img4 = jax.lax.stop_gradient(
            interpolate_bilinear(batch['image'], (h4, w4)))
        img96 = jax.lax.stop_gradient(
            interpolate_bilinear(batch['image'], (th, tw)))
        lst4 = interpolate_bilinear(outs['levelset_feat'], (h4, w4))
        lst96 = interpolate_bilinear(outs['levelset_feat'], (th, tw))
        box96 = jax.lax.stop_gradient(interpolate_bilinear(
            k_maskf.transpose(0, 2, 3, 1), (th, tw)).transpose(0, 3, 1, 2))
        # 0 = full-grid depth budget (reference parity: refine.cu has no
        # depth cap). The doubling passes early-exit at the tree's real
        # depth, so a generous budget costs nothing on shallow trees.
        tf_md = self.tf_max_depth or th * tw
        (parent_i, depth_i), (parent_l, depth_l) = grid_mst_pair(
            img96, lst96, tf_md)

        losses: Dict[str, jnp.ndarray] = {}
        n_layers = len(outs['cls'])
        # one traced per-layer body mapped over the deep-supervision stack
        # (an unrolled 10-layer python loop at LSJ sizes made the program
        # large enough to crash the TPU compiler at batch 2)
        cls_stack = jnp.stack(outs['cls'])          # (L, B, Q, C+1)
        embed_stack = jnp.stack(outs['mask_embeds'])  # (L, B, Q, C)
        mask_feature = outs['mask_feature']         # (B, H4, W4, C)
        img_t = img4.transpose(0, 3, 1, 2)          # (B, 3, h4, w4) shared
        pix = jnp.maximum(k_maskf.sum(axis=(2, 3)), 1.0)

        # ---- Hungarian matching for ALL decoder layers in one batched
        # solve: the exact-JV solver is a sequential augmenting-path
        # while_loop, so running it per layer inside the lax.map pays its
        # full latency L times (74 ms/step profiled); vmapped over L*B
        # the lockstep iterations amortize it to one solve's latency.
        def layer_cost(args):
            cls_pred, mask_embed = args
            mask_pred = jnp.einsum('bqc,bhwc->bqhw', mask_embed,
                                   mask_feature,
                                   preferred_element_type=jnp.float32)
            return (cls_cost_w * classification_cost(cls_pred, k_labels)
                    + dice_cost_w * box_matching_cost(mask_pred, k_maskf))

        costs = jax.lax.map(jax.checkpoint(layer_cost),
                            (cls_stack, embed_stack))     # (L, B, Q, K)
        assigned_lb, _ = hungarian_match(
            costs.reshape(n_layers * B, *costs.shape[2:]),
            jnp.tile(k_valid, (n_layers, 1)))
        assigned_stack = assigned_lb.reshape(n_layers, B, K)

        def layer_losses(args):
            cls_pred, mask_embed, assigned = args
            mask_pred = jnp.einsum('bqc,bhwc->bqhw', mask_embed,
                                   mask_feature,
                                   preferred_element_type=jnp.float32)
            m_valid = k_valid

            # labels per query (invalid slots scatter OOB -> dropped)
            labels = jnp.full((B, self.num_queries), self.num_classes,
                              jnp.int32)
            aq_eff = jnp.where(m_valid, assigned, self.num_queries)
            labels = jax.vmap(
                lambda l, aq, gl: l.at[aq].set(gl, mode='drop'))(
                labels, aq_eff, k_labels)
            logp = jax.nn.log_softmax(cls_pred, axis=-1)
            ce = -jnp.take_along_axis(logp, labels[..., None],
                                      axis=-1)[..., 0]
            wts = class_weight[labels]
            loss_cls = cls_w * (ce * wts).sum() / jnp.maximum(
                wts.sum(), 1.0)

            matched = jnp.take_along_axis(
                mask_pred, assigned[..., None, None], axis=1)  # (B,K,H,W)
            mscore = jax.nn.sigmoid(matched)
            mv = m_valid.astype(jnp.float32)
            mdenom = jnp.maximum(mv.sum(), 1.0)

            # projection dice x box_w (per instance mean)
            px = mscore.max(axis=2)
            tx = k_maskf.max(axis=2)
            py = mscore.max(axis=3)
            ty = k_maskf.max(axis=3)

            def d1(a, t):
                inter = (a * t).sum(-1)
                den = (a ** 2).sum(-1) + (t ** 2).sum(-1) + 1e-5
                return 1.0 - 2.0 * inter / den

            loss_project = box_w * ((d1(px, tx) + d1(py, ty)) * mv
                                    ).sum() / mdenom

            # image level-set x0.05 — shared-target einsum form (no
            # (B, K, 3, h, w) materialization per decoder layer)
            ls_img = region_levelset_shared(mscore, k_maskf, img_t) / pix
            loss_img = 0.05 * ls_w * (ls_img * mv).sum() / mdenom

            m96 = interpolate_bilinear(
                mscore.transpose(0, 2, 3, 1), (th, tw))  # (B,t,t,K)
            return dict(loss_cls=loss_cls, loss_project=loss_project,
                        loss_img=loss_img, mv=mv, mdenom=mdenom, m96=m96)

        # remat: only the tiny (B, Q, C) embeddings are saved per layer;
        # mask logits are recomputed in the backward pass
        pl_stacked = jax.lax.map(jax.checkpoint(layer_losses),
                                 (cls_stack, embed_stack, assigned_stack))
        per_layer = [jax.tree_util.tree_map(lambda x: x[li], pl_stacked)
                     for li in range(n_layers)]
        layer_masks96 = [pl.pop('m96') for pl in per_layer]

        # ---- tree-filtered structural term, all layers in one filter call
        all96 = jnp.concatenate(layer_masks96, axis=-1)  # (B,t,t,L*K)
        deep_img = tree_filter2d(all96, img96, parent_i, depth_i,
                                 sigma=0.02, low_tree=True,
                                 max_depth=tf_md)
        deep_lst = tree_filter2d(deep_img, lst96, parent_l, depth_l,
                                 low_tree=False, max_depth=tf_md)

        # ---- LCM, all layers batched (affinity from the image only)
        lcm = LocalConsistencyModule(dilations=(2,), num_iter=10)
        img96_nchw = img96.transpose(0, 3, 1, 2)
        refined = lcm(img96_nchw,
                      all96.transpose(0, 3, 1, 2))      # (B, L*K, t, t)

        # (B, t, t, L*K) -> (L, B, K, t, t)
        def to_lk(x):
            return x.reshape(B, th, tw, n_layers, K).transpose(3, 0, 4, 1, 2)

        di_stack = to_lk(deep_img)
        dl_stack = to_lk(deep_lst)
        m96_stack = to_lk(all96)
        ref_stack = refined.reshape(B, n_layers, K, th, tw).transpose(
            1, 0, 2, 3, 4)
        pix96 = jnp.maximum(box96.sum(axis=(2, 3)), 1.0)

        def layer_tree_losses(args):
            di, dl, m96, ref, mv, mdenom = args
            high = jnp.stack([di, dl], axis=2) * box96[:, :, None]
            phi96 = jnp.stack([m96, 1.0 - m96], axis=2) * box96[:, :, None]
            ls_hi = region_levelset(
                phi96.reshape(B * K, 2, th, tw),
                high.reshape(B * K, 2, th, tw)) / pix96.reshape(-1)
            loss_feat = 5.0 * ls_w * (ls_hi * mv.reshape(-1)
                                      ).sum() / mdenom
            lcm_num = (jnp.abs(ref - m96) * box96 *
                       mv[..., None, None]).sum()
            lcm_den = jnp.maximum((box96 * mv[..., None, None]).sum(), 1.0)
            loss_lcm = 0.2 * lcm_num / lcm_den
            return loss_feat + loss_lcm

        mv_stack = jnp.stack([pl['mv'] for pl in per_layer])
        md_stack = jnp.stack([pl['mdenom'] for pl in per_layer])
        tree_l = jax.lax.map(layer_tree_losses,
                             (di_stack, dl_stack, m96_stack, ref_stack,
                              mv_stack, md_stack))                 # (L,)

        for li in range(n_layers):
            pl = per_layer[li]
            prefix = '' if li == n_layers - 1 else f'd{li}.'
            losses[f'{prefix}loss_cls'] = pl['loss_cls']
            losses[f'{prefix}loss_project'] = pl['loss_project']
            losses[f'{prefix}loss_levelset'] = pl['loss_img'] + tree_l[li]
        return losses
