"""DiscoBox SOLOv2 head + mask feature head + mean-field CRF, TPU-native.

Capability-parity rebuild of the reference (reference:
mmdet/models/dense_heads/discobox_head.py, 1660 LoC) redesigned for TPU:

- grid kernels/cates via interpolate-then-convs branches, per-grid masks by
  batched einsum over the unified mask feature (vs F.conv2d(groups=N),
  discobox_head.py:1206-1246);
- MIL projection loss (row/col max dice, discobox_head.py:552-562);
- mean-field CRF pseudo-labeling as fixed-iteration stencil updates under
  stop_gradient (discobox_head.py:585-651) — pure XLA, no unfold tensors;
- the teacher/student machinery lives in the detector + train step: the
  teacher is an EMA parameter replica in the train state and the
  ``avg_loss_ins`` gate is a traced scalar (vs the reference's python-side
  running float, single_stage_ts.py:71,230).

The cross-image semantic-correspondence loss (ObjectQueues /
SemanticCorrSolver, discobox_head.py:132-411,900-1139) corresponds to the
reference's ``loss_corr``; configs may set ``loss_corr=None`` (a supported
reference configuration) — see ops/correspondence.py for the TPU port.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..layers import Conv2d, ConvModule, normal_conv_init, \
    bias_init_with_prob
from ...core.targets.solo import sample_positive_cells, solo_targets
from ...ops.color import neighbor_offsets, shift2d
from ...ops.correspondence import (bank_retrieve_batch, info_nce_loss,
                                   relu_l2_norm, solve_correspondence)
from ...ops.nms import mask_matrix_nms, points_nms_2x2
from ...ops.roi_align import roi_align
from ...ops.upsample import interpolate_bilinear
from ...registry import HEADS, LOSSES


def _coord_feat(b, h, w):
    xs = jnp.linspace(-1.0, 1.0, w)
    ys = jnp.linspace(-1.0, 1.0, h)
    x = jnp.broadcast_to(xs[None, None, :], (b, h, w))
    y = jnp.broadcast_to(ys[None, :, None], (b, h, w))
    return jnp.stack([x, y], axis=-1)


def _paste_roi(ci: jnp.ndarray, box: jnp.ndarray, h: int, w: int
               ) -> jnp.ndarray:
    """Paste a (2, mh, mw) ROI map into a (2, h, w) canvas over ``box``
    (xyxy, grid coords) via inverse-ROI bilinear sampling — the static
    shape dual of the reference's dynamic-slice paste
    (discobox_head.py:1104-1108)."""
    mh, mw = ci.shape[1:]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    bw = jnp.maximum(box[2] - box[0], 1e-3)
    bh = jnp.maximum(box[3] - box[1], 1e-3)
    u = (xs - box[0]) / bw * mw - 0.5          # ROI-space coords
    v = (ys - box[1]) / bh * mh - 0.5
    inside = ((xs >= box[0]) & (xs < box[2]))[None, :] & \
             ((ys >= box[1]) & (ys < box[3]))[:, None]

    v0 = jnp.floor(v)
    u0 = jnp.floor(u)
    fv = (v - v0)[:, None]
    fu = (u - u0)[None, :]

    def g(yy, xx):
        yi = jnp.clip(yy, 0, mh - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, mw - 1).astype(jnp.int32)
        return ci[:, yi][:, :, xi]             # (2, h, w)

    out = ((1 - fv) * ((1 - fu) * g(v0, u0) + fu * g(v0, u0 + 1))
           + fv * ((1 - fu) * g(v0 + 1, u0) + fu * g(v0 + 1, u0 + 1)))
    return out * inside[None]


def dice_loss_eps(x: jnp.ndarray, t: jnp.ndarray, eps: float = 1e-3
                  ) -> jnp.ndarray:
    """Per-instance dice with the reference's 0.001 smoothing
    (discobox_head.py dice_loss)."""
    n = x.shape[0]
    x = x.reshape(n, -1)
    t = t.reshape(n, -1)
    a = (x * t).sum(1)
    b = (x * x).sum(1) + eps
    c = (t * t).sum(1) + eps
    return 1.0 - 2.0 * a / (b + c)


def mil_projection_loss(scores: jnp.ndarray, target: jnp.ndarray
                        ) -> jnp.ndarray:
    """Row/col max-projection dice (reference mil_loss,
    discobox_head.py:552-562). scores/target: (N, H, W)."""
    row_l = dice_loss_eps(scores.max(axis=1), target.max(axis=1))
    col_l = dice_loss_eps(scores.max(axis=2), target.max(axis=2))
    return row_l + col_l


class MeanFieldCRF:
    """Fixed-iteration mean-field refinement producing pseudo labels
    (reference MeanField, discobox_head.py:585-651). All math under
    stop_gradient, per-offset stencil ops instead of unfold."""

    def __init__(self, kernel_size=3, theta0=0.5, theta1=30.0,
                 theta2=20.0, alpha0=2.0, base=0.10, num_iter=10,
                 gamma=0.01):
        self.kernel_size = kernel_size
        self.theta0 = theta0
        self.theta1 = theta1
        self.alpha0 = alpha0
        self.base = base
        self.num_iter = num_iter
        self.gamma = gamma
        half = kernel_size // 2
        self.offsets = [(dy, dx) for dy in range(-half, half + 1)
                        for dx in range(-half, half + 1)]

    def build_kernel(self, color_feat: jnp.ndarray) -> jnp.ndarray:
        """color_feat: (B, H, W, 3) image resized to mask resolution.
        Returns (B, O, H, W) appearance+spatial kernel (reference adds 10
        to the feature map first; shift-outside pixels then differ by 10
        per channel, matching the zero-padded unfold)."""
        feat = (color_feat + 10.0).transpose(0, 3, 1, 2)      # (B,3,H,W)
        ks = []
        for dy, dx in self.offsets:
            nb = shift2d(feat, dy, dx, h_axis=2)              # zero pad
            diff2 = ((nb - feat) ** 2).sum(axis=1)            # (B,H,W)
            spatial = float(dy * dy + dx * dx)
            ks.append(self.alpha0 * jnp.exp(
                -diff2 / (2 * self.theta0 ** 2)
                - spatial / (2 * self.theta1 ** 2)))
        return jnp.stack(ks, axis=1)                          # (B,O,H,W)

    def __call__(self, kernel: jnp.ndarray, x: jnp.ndarray,
                 targets: jnp.ndarray,
                 iiu: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """kernel: (B, O, H, W) per-image; x: (B, K, H, W) mask scores
        (already teacher/student averaged); targets: (B, K, H, W) box
        masks. iiu: optional (B, K, 2, H, W) inter-image priors.
        Returns binary pseudo labels (B, K, H, W)."""
        base = self.base
        x = jax.lax.stop_gradient(x * targets)

        # The state is re-binarized to {base, 1-base} every iteration, so
        # neglog(state) takes only two values per channel and bg = 1-fg:
        # the 9-offset stencil therefore only needs the BINARY fg map —
        # half the channels of the reference's (bg, fg) unfold — with the
        # per-offset zero-padding folded into a precomputed valid-masked
        # kernel sum. Exactly the reference's fixed point, ~2x less HBM
        # traffic per iteration (the CRF was 22 ms/step profiled).
        #   neglog_fg = A + B*bin, neglog_bg = (A+B) - B*bin (in bounds)
        a_c = -float(np.log(base))
        b_c = float(np.log(base) - np.log(1.0 - base))
        h, w = x.shape[-2], x.shape[-1]
        kv = 0.0                    # sum_o k_o * in_bounds_o : (B, H, W)
        for o, (dy, dx) in enumerate(self.offsets):
            m = np.zeros((h, w), np.float32)
            ys = slice(max(dy, 0), h + min(dy, 0))
            xs = slice(max(dx, 0), w + min(dx, 0))
            m[ys, xs] = 1.0
            kv = kv + kernel[:, o] * jnp.asarray(m)

        bin0 = (x > 0.5).astype(jnp.float32)                  # (B,K,H,W)
        hh, ww = bin0.shape[-2], bin0.shape[-1]

        def stencil(bin_fg):
            # one zero-pad + 9 static slices: XLA fuses the whole
            # message-passing pass into a single HBM traversal (the
            # shift2d formulation materialized 9 shifted copies —
            # 1.26 ms/iter vs ~0.35 ms/iter at DiscoBox bench shapes)
            pad = jnp.pad(bin_fg, ((0, 0), (0, 0), (1, 1), (1, 1)))
            s = 0.0
            for o, (dy, dx) in enumerate(self.offsets):
                s = s + pad[:, :, 1 + dy:1 + dy + hh,
                            1 + dx:1 + dx + ww] * kernel[:, None, o]
            return s

        if iiu is None:
            # the update only ever compares fg = exp(-a*kv - b*s)*t + eps
            # against bg = exp(-(a+b)*kv + b*s) + eps; with binary t and
            # b = log(base) - log(1-base) < 0 this reduces algebraically
            # to t AND s > kv/2 — no transcendentals, same fixed point
            if jax.default_backend() == 'tpu':
                # VMEM-resident fixed point: the fused-XLA loop re-reads
                # the padded state per offset (1.2 ms/round profiled)
                from ...ops.pallas_kernels import crf_mean_field_pallas
                return crf_mean_field_pallas(kernel, 0.5 * kv, bin0,
                                             targets, self.offsets,
                                             self.num_iter)
            thresh = 0.5 * kv[:, None]                        # (B,1,H,W)

            def body(_, bin_fg):
                keep = (stencil(bin_fg) > thresh) & (targets > 0)
                return keep.astype(jnp.float32)

            return jax.lax.fori_loop(0, self.num_iter, body, bin0)

        def body(_, bin_fg):
            s = stencil(bin_fg)
            aggre_fg = a_c * kv[:, None] + b_c * s
            aggre_bg = (a_c + b_c) * kv[:, None] - b_c * s
            f_fg = jnp.exp(-aggre_fg) + iiu[:, :, 1] * self.gamma
            f_bg = jnp.exp(-aggre_bg) + iiu[:, :, 0] * self.gamma
            fg = f_fg * targets + 1e-6
            bg = f_bg + 1e-6
            return (fg / (fg + bg) > 0.5).astype(jnp.float32)

        return jax.lax.fori_loop(0, self.num_iter, body, bin0)


@HEADS.register_module()
class DiscoBoxMaskFeatHead(nn.Module):
    """Unified stride-4 mask feature (reference: DiscoBoxMaskFeatHead,
    discobox_head.py:415-520): per-level conv(+up) chains summed, coord
    channels on the last level, 1x1 GN conv head."""
    in_channels: int = 256
    out_channels: int = 128
    start_level: int = 0
    end_level: int = 3
    num_classes: int = 256     # output channels (reference naming)
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[Any] = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        norm = self.norm_cfg or dict(type='GN', num_groups=32)
        init01 = normal_conv_init(0.01)
        b = feats[0].shape[0]
        target_hw = feats[0].shape[1:3]
        out = None
        n_levels = self.end_level - self.start_level + 1
        for i in range(n_levels):
            x = feats[i]
            if i == 3:
                x = jnp.concatenate(
                    [x, _coord_feat(b, x.shape[1], x.shape[2])], axis=-1)
            for j in range(max(i, 1)):
                x = ConvModule(self.out_channels, 3, 1, 1, norm_cfg=norm,
                               kernel_init=init01,
                               name=f'level_{i}_conv_{j}')(x, train=train)
                if i > 0:
                    x = interpolate_bilinear(
                        x, (x.shape[1] * 2, x.shape[2] * 2))
            if x.shape[1:3] != tuple(target_hw):
                x = interpolate_bilinear(x, target_hw)
            out = x if out is None else out + x
        return ConvModule(self.num_classes, 1, 1, 0, norm_cfg=norm,
                          kernel_init=init01, name='conv_pred')(
            out, train=train)


@HEADS.register_module()
class DiscoBoxSOLOv2Head(nn.Module):
    """Grid category + kernel branches (reference: DiscoBoxSOLOv2Head,
    discobox_head.py:656-857)."""
    num_classes: int
    in_channels: int = 256
    seg_feat_channels: int = 512
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 8, 16, 32, 32)
    base_edge_list: Sequence[int] = (16, 32, 64, 128, 256)
    scale_ranges: Sequence = ((1, 96), (48, 192), (96, 384), (192, 768),
                              (384, 2048))
    sigma: float = 0.2
    num_grids: Sequence[int] = (40, 36, 24, 16, 12)
    ins_out_channels: int = 256
    loss_ins: Optional[dict] = None
    loss_ts: Optional[dict] = None
    loss_cate: Optional[dict] = None
    loss_corr: Optional[dict] = None
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    use_dcn_in_tower: bool = False
    type_dcn: Optional[str] = None
    init_cfg: Optional[Any] = None
    max_pos: int = 128          # static positive capacity per batch image
    max_corr_queries: int = 16  # static query capacity for the corr loss

    @property
    def corr_cfg(self) -> Dict:
        return dict(self.loss_corr or {})

    @property
    def obj_bank_cfg(self) -> Dict:
        return dict(self.corr_cfg.get('obj_bank', {}))

    @property
    def num_cells(self) -> int:
        return int(sum(s * s for s in self.num_grids))

    @nn.compact
    def __call__(self, feats, train: bool = False):
        gn = dict(type='GN', num_groups=min(32, self.seg_feat_channels))
        init01 = normal_conv_init(0.01)
        b = feats[0].shape[0]
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
        solo_kernel = Conv2d(self.ins_out_channels, 3, 1, 1,
                             kernel_init=init01, name='solo_kernel')

        kernels, cates = [], []
        for lvl, x in enumerate(new_feats):
            s = self.num_grids[lvl]
            coord = _coord_feat(b, x.shape[1], x.shape[2])
            # interpolate the coord-augmented feature to the grid FIRST
            # (reference forward_single, discobox_head.py:817-833)
            kfeat = interpolate_bilinear(
                jnp.concatenate([x, coord], axis=-1), (s, s))
            cfeat = kfeat[..., :-2]
            for i in range(self.stacked_convs):
                kfeat = kernel_convs[i](kfeat, train=train)
                cfeat = cate_convs[i](cfeat, train=train)
            kernel_pred = solo_kernel(kfeat)
            cate_pred = solo_cate(cfeat)
            if not train:
                cate_pred = jax.nn.sigmoid(cate_pred)
                cate_pred = points_nms_2x2(
                    cate_pred.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
            kernels.append(kernel_pred.reshape(b, s * s, -1))
            cates.append(cate_pred.reshape(b, s * s, -1))
        return dict(kernels=jnp.concatenate(kernels, axis=1),
                    cates=jnp.concatenate(cates, axis=1))

    def decode_masks(self, mask_feat, kernels):
        return jnp.einsum('bhwe,bke->bkhw', mask_feat, kernels,
                          preferred_element_type=jnp.float32)

    # ---------------------------------------------------- correspondence
    def _mask_boxes(self, box_mask: jnp.ndarray) -> jnp.ndarray:
        """(B, K, H, W) -> (B, K, 4) tight xyxy extents in grid coords
        (reference derives ROI boxes from target extents,
        discobox_head.py:1030-1037)."""
        rows = box_mask.max(axis=3) > 0          # (B, K, H)
        cols = box_mask.max(axis=2) > 0          # (B, K, W)
        h = rows.shape[-1]
        w = cols.shape[-1]
        min_y = jnp.argmax(rows, axis=-1)
        max_y = h - jnp.argmax(rows[..., ::-1], axis=-1)
        min_x = jnp.argmax(cols, axis=-1)
        max_x = w - jnp.argmax(cols[..., ::-1], axis=-1)
        return jnp.stack([min_x, min_y, max_x, max_y], -1).astype(
            jnp.float32)

    def _corr_terms(self, bank, s_scores, t_scores, box_mask, labels_k,
                    valid_k, s_feat, t_feat, corr_gate):
        """Cross-image correspondence loss + inter-image (iiu) CRF priors
        + bank append entries (reference corr_loss,
        discobox_head.py:900-1139)."""
        cfg = self.corr_cfg
        ob = self.obj_bank_cfg
        fh = ob.get('feat_height', 7)
        fw = ob.get('feat_width', 7)
        mh = ob.get('mask_height', 28)
        mw = ob.get('mask_width', 28)
        min_size = ob.get('min_size', 32)
        B, K, H4, W4 = s_scores.shape
        Q = self.max_corr_queries

        boxes = jax.lax.stop_gradient(self._mask_boxes(box_mask))
        # flatten and take the first Q valid instances across the batch
        flat_valid = valid_k.reshape(-1)
        key = jnp.where(flat_valid, jnp.arange(B * K),
                        B * K + jnp.arange(B * K))
        order = jnp.argsort(key)[:Q]
        q_valid = jnp.take(flat_valid, order)
        img_idx = (order // K).astype(jnp.float32)
        q_boxes = boxes.reshape(-1, 4)[order]
        q_labels = labels_k.reshape(-1)[order]

        rois_feat = jnp.concatenate([img_idx[:, None], q_boxes], axis=1)
        q_feat = relu_l2_norm(
            roi_align(s_feat, rois_feat, (fh, fw)), axis=-1)
        t_feat_eff = t_feat if t_feat is not None else \
            jax.lax.stop_gradient(s_feat)
        qt_feat = relu_l2_norm(
            roi_align(jax.lax.stop_gradient(t_feat_eff), rois_feat,
                      (fh, fw)), axis=-1)

        inst_scores = jax.lax.stop_gradient(
            s_scores.reshape(B * K, H4, W4, 1))
        rois_mask = jnp.concatenate(
            [order[:, None].astype(jnp.float32), q_boxes], axis=1)
        q_mask = roi_align(inst_scores, rois_mask, (mh, mw))[..., 0]
        inst_t = jax.lax.stop_gradient(t_scores.reshape(B * K, H4, W4, 1))
        qt_mask = roi_align(inst_t, rois_mask, (mh, mw))[..., 0]

        # retrieval (flat batched gathers — a vmap of the per-query
        # version lowered to dynamic-update-slice chains, ~4.3 ms/step)
        kf, km, pair_valid = bank_retrieve_batch(
            bank, q_labels, q_feat, q_mask, q_boxes,
            fg_iou_thresh=ob.get('fg_iou_thresh', 0.7),
            bg_iou_thresh=ob.get('bg_iou_thresh', 0.7),
            appear_thresh=ob.get('appear_thresh', 0.7),
            ratio_range=tuple(ob.get('ratio_range', (0.9, 1.2))),
            max_retrieval=ob.get('max_retrieval_objs', 5))
        R = kf.shape[1]
        q_ok = q_valid & (pair_valid.sum(-1) >= min(5, R))

        # regularized Hough matching per query against its R keys
        qcells = q_feat.reshape(Q, 1, fh * fw, -1)
        qcells = jnp.broadcast_to(qcells, (Q, R) + qcells.shape[2:])
        kcells = kf.reshape(Q, R, fh * fw, -1)
        cu, t_assign = jax.vmap(
            lambda qq, kk: solve_correspondence(
                qq, kk, (fh, fw),
                num_iter=cfg.get('corr_num_iter', 10),
                num_smooth_iter=cfg.get('corr_num_smooth_iter', 1),
                dist_kernel=cfg.get('dist_kernel', 9)))(qcells, kcells)

        # reference quirk: CrossEntropyLoss receives the already-softmaxed
        # Cu as "logits" (discobox_head.py:1083-1086) — replicate it
        cu_soft = jax.nn.softmax(cu, axis=-1)
        per_q = jax.vmap(info_nce_loss)(cu_soft, t_assign, pair_valid)
        okf = q_ok.astype(jnp.float32)
        loss_corr = (per_q * okf).sum() / jnp.maximum(okf.sum(), 1e-4)
        loss_corr = loss_corr * cfg.get('loss_weight', 1.0) * corr_gate

        # ---- inter-image priors (iiu) for the CRF.
        # One traced body mapped over the Q queries (lax.map) instead of an
        # unrolled python loop: Q-fold smaller HLO and the (R, 784, 784)
        # superres intermediates live once, not Q times.
        nmask = mh * mw
        up = lambda x, hw: interpolate_bilinear(x, hw)

        def _query_canvas(args):
            t_a, cu_q, qm_q, km_q, pv, qbox = args
            t_q = jax.lax.stop_gradient(t_a)                   # (R,49,49)
            t_q = t_q * jax.lax.stop_gradient(
                jax.nn.softmax(cu_q, axis=2))
            t_q = t_q / (t_q.sum(2, keepdims=True) + 1e-5)
            # superres (R, 49, 49) -> (R, 784, 784)
            tq = up(t_q.reshape(R * fh * fw, fh, fw, 1),
                    (mh, mw)).reshape(R, fh * fw, nmask)
            tq = tq.transpose(0, 2, 1).reshape(R * nmask, fh, fw, 1)
            tq = up(tq, (mh, mw)).reshape(R, nmask, nmask)
            tq = tq.transpose(0, 2, 1) * (fh * fw / nmask)
            qm = qm_q.reshape(-1)                               # (784,)
            kmf = km_q.reshape(R, -1)
            fg_pair = (qm[None, :, None] * kmf[:, None, :]) > 0.5
            bg_pair = ((1 - qm)[None, :, None]
                       * (1 - kmf)[:, None, :]) > 0.5
            pvf = pv.astype(jnp.float32)
            denom_r = jnp.maximum(pvf.sum(), 1e-4)
            fg_ci = jnp.einsum(
                'rnm,rm->n', tq * fg_pair,
                jnp.clip(kmf, 0.1, 0.9) * pvf[:, None]) / denom_r
            bg_ci = jnp.einsum(
                'rnm,rm->n', tq * bg_pair,
                jnp.clip(1 - kmf, 0.1, 0.9) * pvf[:, None]) / denom_r
            ci = jnp.stack([bg_ci, fg_ci]).reshape(2, mh, mw)
            return _paste_roi(ci, qbox, H4, W4)

        canvases = jax.lax.map(
            _query_canvas,
            (t_assign, cu, q_mask, km, pair_valid, q_boxes))   # (Q,2,H4,W4)
        # COMPACT iiu: only the Q corr-query slots carry nonzero priors
        # (reference computes the inter-image mean field per matched
        # object, discobox_head.py:900-1139) — the consumer runs the
        # exp-based CRF on just these rows instead of all B*K padded
        # slots (256 -> 16 instances, ~12 ms/step saved at bench shapes)
        iiu = dict(
            rows=jax.lax.stop_gradient(
                canvases * q_ok[:, None, None, None].astype(jnp.float32)
                * corr_gate),
            order=order)

        # ---- bank append entries (teacher crops; reference :1117-1131)
        wide = (q_boxes[:, 2] - q_boxes[:, 0]) > min_size
        tall = (q_boxes[:, 3] - q_boxes[:, 1]) > min_size
        append = dict(labels=q_labels,
                      feats=jax.lax.stop_gradient(qt_feat),
                      masks=jax.lax.stop_gradient(qt_mask),
                      boxes=q_boxes,
                      valid=q_valid & wide & tall & (corr_gate > 0))
        return loss_corr, iiu, append

    # ------------------------------------------------------------------ loss
    def loss(self, outs: Dict, mask_feat: jnp.ndarray,
             batch: Dict[str, jnp.ndarray],
             teacher: Optional[Dict] = None,
             use_ts_gate: Optional[jnp.ndarray] = None,
             corr_gate: Optional[jnp.ndarray] = None,
             bank=None, s_feat=None, t_feat=None
             ) -> Dict[str, jnp.ndarray]:
        """Student losses; teacher (optional) carries stop-gradient
        kernels/mask_feat from the EMA replica. ``use_ts_gate`` is the
        traced (0/1) avg_loss_ins<0.3 gate; the CRF term is always
        computed and multiplicatively gated (XLA-friendly lax-free
        control flow)."""
        loss_cate_fn = LOSSES.build(self.loss_cate or dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0))
        ins_w = (self.loss_ins or {}).get('loss_weight', 1.0)
        ts_cfg = dict(self.loss_ts or {})
        ts_w = ts_cfg.get('loss_weight', 1.0)

        B, H, W, _ = batch['image'].shape
        targets = solo_targets(
            batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
            batch['gt_masks'], (H, W), self.num_grids, self.scale_ranges,
            self.sigma, self.num_classes, mask_stride=4, min_mask_area=1.0)
        num_pos = targets.num_pos.astype(jnp.float32)
        loss_cate = loss_cate_fn(outs['cates'], targets.cate_labels,
                                 avg_factor=num_pos + 1.0)

        cell_idx, gt_idx, valid = sample_positive_cells(
            targets.cell_gt, self.max_pos)
        vmask = valid.astype(jnp.float32)
        denom = jnp.maximum(vmask.sum(), 1.0)

        s_kernels = jnp.take_along_axis(outs['kernels'],
                                        cell_idx[..., None], axis=1)
        s_logits = self.decode_masks(mask_feat, s_kernels)
        s_scores = jax.nn.sigmoid(s_logits)                  # (B,K,H4,W4)
        box_mask = jax.lax.stop_gradient(jnp.take_along_axis(
            batch['gt_masks'].astype(jnp.float32),
            gt_idx[..., None, None], axis=1))

        K = s_scores.shape[1]
        h4, w4 = s_scores.shape[2:]
        mil = mil_projection_loss(s_scores.reshape(B * K, h4, w4),
                                  box_mask.reshape(B * K, h4, w4))
        loss_ins = ins_w * (mil * vmask.reshape(-1)).sum() / denom

        # --- teacher-student CRF term
        if teacher is not None:
            t_kernels = jnp.take_along_axis(teacher['kernels'],
                                            cell_idx[..., None], axis=1)
            t_scores = jax.nn.sigmoid(self.decode_masks(
                teacher['mask_feat'], t_kernels))
            t_scores = jax.lax.stop_gradient(t_scores)
        else:
            t_scores = s_scores

        # --- cross-image correspondence (reference gates it on
        # avg_loss_ins < 0.2 and feeds its iiu priors into a second CRF
        # pass whose dice adds into loss_ts, discobox_head.py:1310-1339)
        loss_corr = None
        iiu = None
        corr_append = None
        if bank is not None and self.loss_corr is not None \
                and s_feat is not None:
            labels_k = jnp.take_along_axis(batch['gt_labels'], gt_idx,
                                           axis=1)
            cg = corr_gate if corr_gate is not None else jnp.float32(0.0)
            loss_corr, iiu, corr_append = self._corr_terms(
                bank, s_scores, t_scores, box_mask, labels_k, valid,
                s_feat, t_feat, cg)

        crf = MeanFieldCRF(
            kernel_size=ts_cfg.get('kernel', 3),
            theta0=ts_cfg.get('theta0', 0.5),
            theta1=ts_cfg.get('theta1', 30.0),
            theta2=ts_cfg.get('theta2', 20.0),
            alpha0=ts_cfg.get('alpha0', 2.0),
            base=ts_cfg.get('base', 0.10),
            num_iter=ts_cfg.get('max_iter', 10))
        color = jax.lax.stop_gradient(
            interpolate_bilinear(batch['image'], (h4, w4),
                                 align_corners=True))
        kernel = crf.build_kernel(color)
        avg_scores = (s_scores + t_scores) / 2.0
        pseudo = jax.lax.stop_gradient(
            crf(kernel, avg_scores, box_mask))
        # enlarged target: 3x3 dilation of the box mask
        enlarged = jnp.stack(
            [shift2d(box_mask, dy, dx, h_axis=2)
             for dy, dx in neighbor_offsets(3, 1)] + [box_mask],
            axis=0).max(axis=0)
        s_flat = (s_scores * enlarged).reshape(B * K, -1)
        ts = dice_loss_eps(s_flat, pseudo.reshape(B * K, -1))
        loss_ts_val = (ts * vmask.reshape(-1)).sum() / denom
        if iiu is not None:
            # run the exp-based iiu CRF on ONLY the Q corr-query rows
            # (all other slots have iiu == 0, where the iiu fixed point
            # coincides with the plain CRF's ``pseudo``), then write the
            # refined rows back over the plain result
            order_q = iiu['order']
            img_q = order_q // K
            h4w, w4w = box_mask.shape[-2], box_mask.shape[-1]
            xq = avg_scores.reshape(B * K, h4w, w4w)[order_q][:, None]
            tq = box_mask.reshape(B * K, h4w, w4w)[order_q][:, None]
            pq = jax.lax.stop_gradient(
                crf(kernel[img_q], xq, tq,
                    iiu=iiu['rows'][:, None]))[:, 0]
            pseudo_iiu = pseudo.reshape(B * K, h4w, w4w) \
                .at[order_q].set(pq)
            ts2 = dice_loss_eps(s_flat, pseudo_iiu.reshape(B * K, -1))
            cg = corr_gate if corr_gate is not None else jnp.float32(0.0)
            loss_ts_val = loss_ts_val + cg * (
                ts2 * vmask.reshape(-1)).sum() / denom
        gate = use_ts_gate if use_ts_gate is not None else jnp.float32(1.0)
        loss_ts_val = ts_w * loss_ts_val * gate

        losses = dict(loss_ins=loss_ins, loss_ts=loss_ts_val,
                      loss_cate=loss_cate)
        if loss_corr is not None:
            losses['loss_corr'] = loss_corr
        if corr_append is not None:
            losses['_corr_append'] = corr_append
        return losses

    # ------------------------------------------------------------- inference
    def get_seg(self, outs: Dict, mask_feat: jnp.ndarray, test_cfg: Dict
                ) -> Dict[str, jnp.ndarray]:
        cfg = dict(test_cfg or {})
        score_thr = float(cfg.get('score_thr', 0.1))
        mask_thr = float(cfg.get('mask_thr', 0.4))
        filter_thr = float(cfg.get('filter_thr', 0.05))
        nms_pre = int(cfg.get('nms_pre', 500))
        max_per_img = int(cfg.get('max_per_img', 100))
        kernel = cfg.get('kernel', 'gaussian')
        sigma = float(cfg.get('sigma', 2.0))

        cates = outs['cates']
        B, Pc, C = cates.shape
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
        mask_scores = jax.nn.sigmoid(self.decode_masks(mask_feat, kernels))
        seg_masks = (mask_scores > mask_thr).astype(jnp.float32)
        sum_masks = seg_masks.sum(axis=(2, 3))
        keep = (sum_masks > strides[cell]) & (top_scores > 0)
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
        final_masks = jnp.take_along_axis(mask_scores,
                                          order[..., None, None], axis=1)
        return dict(scores=final_scores, labels=final_labels,
                    masks=final_masks, valid=final_scores > 0)
