"""Full PREDICT-path parity for converted BoxInst checkpoints: the final
post-NMS detections (boxes, scores, labels) and binarized instance masks
must match between

  * a torch model with the reference's module naming + the reference's
    inference chain executed verbatim — get_bboxes/_get_bboxes per-level
    topk + distance2bbox (condinst_head.py:707-853), `nms_with_others`
    AST-extracted from the reference source (condinst_head.py:18-83) with
    an mmcv-semantics batched_nms, and CondInstMaskHead.forward +
    parse_dynamic_params extracted from the reference
    (condinst_head.py:1120-1165) followed by the simple_test
    sigmoid/upsample/crop/threshold chain (condinst_head.py:1234-1283);
  * our jitted `CondInst.predict` + host `format_detection` after
    `convert_reference_checkpoint`.

This closes the gap between feature-map parity and AP parity: everything
the COCO evaluator consumes is compared, detection by detection.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from boxinstseg_tpu.registry import build_detector
from boxinstseg_tpu.utils.checkpoint_convert import \
    convert_reference_checkpoint

from test_boxinst_convert_parity import _build_torch_boxinst, NUM_CLASSES

H, W = 64, 96
STRIDES = [8, 16, 32, 64, 128]
SOI = [64, 128, 256, 512, 1024]


def _torch_batched_nms(torch):
    """mmcv.ops.nms.batched_nms semantics: offset boxes per class, greedy
    hard NMS (suppress IoU > thr), dets sorted by score desc."""
    def nms(boxes, scores, iou_thr):
        order = torch.argsort(scores, descending=True, stable=True)
        keep = []
        suppressed = torch.zeros(len(boxes), dtype=torch.bool)
        x1, y1, x2, y2 = boxes.unbind(-1)
        areas = (x2 - x1) * (y2 - y1)
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            xx1 = torch.maximum(x1[i], x1)
            yy1 = torch.maximum(y1[i], y1)
            xx2 = torch.minimum(x2[i], x2)
            yy2 = torch.minimum(y2[i], y2)
            inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
            iou = inter / (areas[i] + areas - inter).clamp(min=1e-12)
            suppressed |= iou > iou_thr
        return torch.as_tensor(keep, dtype=torch.long)

    def batched_nms(boxes, scores, idxs, nms_cfg):
        iou_thr = nms_cfg['iou_threshold']
        max_coord = boxes.max() if boxes.numel() else 0
        offsets = idxs.to(boxes) * (max_coord + torch.tensor(1.0))
        keep = nms(boxes + offsets[:, None], scores, iou_thr)
        dets = torch.cat([boxes[keep], scores[keep, None]], dim=1)
        return dets, keep
    return batched_nms


def _ref_predict(torch, tmodel, x, test_cfg):
    """Run the reference inference chain on the torch twin."""
    import torch.nn.functional as F
    from ref_oracle import load_ref, load_ref_method
    from types import SimpleNamespace

    ref = load_ref('mmdet/models/dense_heads/condinst_head.py',
                   ['nms_with_others', 'aligned_bilinear'],
                   extra_ns={'batched_nms': _torch_batched_nms(torch)})
    nms_with_others = ref['nms_with_others']
    aligned_bilinear = ref['aligned_bilinear']
    distance2bbox = load_ref('mmdet/core/bbox/transforms.py',
                             ['distance2bbox'])['distance2bbox']

    with torch.no_grad():
        t = torch.as_tensor(x.transpose(0, 3, 1, 2))
        c2345 = []
        t2 = tmodel.backbone.maxpool(
            tmodel.backbone.bn1(tmodel.backbone.conv1(t)).relu())
        for s in range(4):
            for block in getattr(tmodel.backbone, f'layer{s + 1}'):
                t2 = block.fwd(t2)
            c2345.append(t2)
        fpn = tmodel.neck(c2345[1:])
        outs = tmodel.bbox_head(fpn, tmodel.mask_head.param_conv, STRIDES)
        mask_feat = tmodel.mask_branch(fpn[:3], aligned_bilinear)

        # ---- _get_bboxes (reference condinst_head.py:707-853), batch 1
        mlvl = dict(boxes=[], scores=[], ctr=[], params=[], coors=[],
                    levels=[])
        for lvl, stride in enumerate(STRIDES):
            cls = outs['cls'][lvl]
            _, _, h, w = cls.shape
            scores = cls.permute(0, 2, 3, 1).reshape(-1,
                                                     NUM_CLASSES).sigmoid()
            ctr = outs['ctr'][lvl].permute(0, 2, 3, 1).reshape(-1).sigmoid()
            bbox = outs['bbox'][lvl].permute(0, 2, 3, 1).reshape(-1, 4)
            par = outs['param'][lvl].permute(0, 2, 3, 1).reshape(
                -1, outs['param'][lvl].shape[1])
            ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w))
            points = torch.stack(
                [(xs.reshape(-1) + 0.5) * stride,
                 (ys.reshape(-1) + 0.5) * stride], dim=-1).float()
            nms_pre = min(test_cfg['nms_pre'], bbox.shape[0])
            max_scores, _ = (scores * ctr[:, None]).max(-1)
            _, topk = max_scores.topk(nms_pre)
            points, bbox = points[topk], bbox[topk]
            scores, ctr, par = scores[topk], ctr[topk], par[topk]
            boxes = distance2bbox(points, bbox, max_shape=(H, W))
            mlvl['boxes'].append(boxes)
            mlvl['scores'].append(scores)
            mlvl['ctr'].append(ctr)
            mlvl['params'].append(par)
            mlvl['coors'].append(points)
            mlvl['levels'].append(torch.full((len(boxes),), lvl,
                                             dtype=torch.long))
        boxes = torch.cat(mlvl['boxes'])
        scores = torch.cat(mlvl['scores'])
        ctr = torch.cat(mlvl['ctr'])
        params = torch.cat(mlvl['params'])
        coors = torch.cat(mlvl['coors'])
        levels = torch.cat(mlvl['levels'])
        padding = scores.new_zeros(scores.shape[0], 1)
        scores = torch.cat([scores, padding], dim=1)
        det_bbox, det_label, others = nms_with_others(
            boxes, scores, test_cfg['score_thr'], test_cfg['nms'],
            test_cfg['max_per_img'], score_factors=ctr,
            others=[params, coors, levels])
        det_params, det_coors, det_levels = others

        # ---- mask head forward (reference condinst_head.py:1120-1165)
        def parse_dynamic_params(self, p):
            fn = load_ref_method(
                'mmdet/models/dense_heads/condinst_head.py',
                'CondInstMaskHead', 'parse_dynamic_params')
            return fn(self, p)

        mh = SimpleNamespace(
            disable_rel_coors=False, in_stride=8, out_stride=4,
            dynamic_convs=3, dynamic_channels=8,
            dy_weights=[80, 64, 8], dy_biases=[8, 8, 1],
            sizes_of_interest=torch.tensor(SOI))
        mh.parse_dynamic_params = lambda p: parse_dynamic_params(mh, p)
        fwd = load_ref_method(
            'mmdet/models/dense_heads/condinst_head.py',
            'CondInstMaskHead', 'forward',
            extra_ns={'aligned_bilinear': aligned_bilinear})
        if det_params.shape[0] == 0:
            return det_bbox.numpy(), det_label.numpy(), []
        img_inds = torch.zeros(det_params.shape[0], dtype=torch.long)
        mask_logits = fwd(mh, mask_feat, det_params, det_coors,
                          det_levels, img_inds)
        # ---- simple_test chain (reference condinst_head.py:1253-1283)
        mask_preds = aligned_bilinear(mask_logits.sigmoid(), 4)
        mask_preds = mask_preds[:, :, :H, :W]
        mask_preds = F.interpolate(mask_preds, (H, W), mode='bilinear',
                                   align_corners=False)
        masks = (mask_preds.squeeze(1) > 0.5).numpy().astype(np.uint8)
        return det_bbox.numpy(), det_label.numpy(), masks


def test_boxinst_predict_path_parity(rng):
    torch = pytest.importorskip('torch')
    from torch import nn
    from test_boxinst_model import tiny_boxinst_cfg
    from boxinstseg_tpu.apis.test import format_detection

    tmodel = _build_torch_boxinst(torch, nn)
    params, stats = convert_reference_checkpoint(tmodel.state_dict())

    cfg = tiny_boxinst_cfg()
    cfg['mask_branch']['branch_channels'] = 16
    cfg['mask_branch']['branch_out_channels'] = 8
    # enough NMS candidates that the static-capacity path sees the same
    # candidate set as the reference's dynamic path
    cfg['test_cfg'] = dict(nms_pre=100, score_thr=0.30,
                           nms=dict(type='nms', iou_threshold=0.5),
                           max_per_img=10, pre_nms_limit=300)
    model = build_detector(cfg)

    x = rng.randn(1, H, W, 3).astype(np.float32)
    ref_boxes, ref_labels, ref_masks = _ref_predict(
        torch, tmodel, x, cfg['test_cfg'])

    variables = {'params': params, 'batch_stats': stats}
    batch = {
        'image': jnp.asarray(x),
        'img_shape': jnp.asarray([[H, W]], jnp.int32),
        'scale_factor': jnp.ones((1, 4), jnp.float32),
    }
    with jax.default_matmul_precision('highest'):
        out = jax.jit(lambda v, b: model.apply(
            v, b, method=model.predict))(variables, batch)
    out = jax.tree_util.tree_map(np.asarray, out)
    res = format_detection(out, 0, (H, W), (H, W), cfg['test_cfg'])

    # ---- compare, score-sorted on both sides
    n_ref = len(ref_boxes)
    assert n_ref > 0, 'fixture degenerate: reference produced 0 dets'
    assert len(res.bboxes) == n_ref, \
        f'det count: ours {len(res.bboxes)} vs reference {n_ref}'
    r_order = np.argsort(-ref_boxes[:, 4], kind='mergesort')
    o_order = np.argsort(-res.bboxes[:, 4], kind='mergesort')
    np.testing.assert_allclose(
        res.bboxes[o_order, 4], ref_boxes[r_order, 4], atol=1e-3,
        err_msg='post-NMS scores diverge')
    np.testing.assert_allclose(
        res.bboxes[o_order, :4], ref_boxes[r_order, :4], atol=0.05,
        err_msg='post-NMS boxes diverge')
    np.testing.assert_array_equal(res.labels[o_order],
                                  ref_labels[r_order])
    for oi, ri in zip(o_order, r_order):
        ours, ref = res.masks[oi], ref_masks[ri]
        assert ours.shape == ref.shape
        inter = np.logical_and(ours, ref).sum()
        union = np.logical_or(ours, ref).sum()
        if union == 0:
            continue
        iou = inter / union
        assert iou > 0.98, f'instance mask IoU {iou:.4f} (det {oi})'
