"""CondInstBoxHead.loss AGGREGATE golden test: the full loss wiring —
num_pos clamp, focal avg_factor, centerness-weighted GIoU with
centerness_denorm, BCE centerness — reproduced from the reference's own
loss body (condinst_head.py:364-476) with its extracted pieces."""
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from ref_oracle import load_ref, load_ref_method, ref_available, to_np, \
    to_torch

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason='reference tree not mounted')

CONDINST = 'mmdet/models/dense_heads/condinst_head.py'
B = 2
C = 4
LEVELS = [(8, 8), (4, 4)]
STRIDES = [8, 16]
RANGES = [(-1, 64), (64, 1e8)]


def _points():
    pts = []
    for (h, w), s in zip(LEVELS, STRIDES):
        ys, xs = np.mgrid[:h, :w]
        pts.append(np.stack([(xs.ravel() + 0.5) * s,
                             (ys.ravel() + 0.5) * s], -1))
    return np.concatenate(pts).astype(np.float32)


def test_golden_box_head_loss_aggregate(rng):
    import torch
    import torch.nn.functional as F
    from boxinstseg_tpu.models.dense_heads.condinst_head import \
        CondInstBoxHead

    P = sum(h * w for h, w in LEVELS)
    cls = rng.randn(B, P, C).astype(np.float32) * 2
    bbox = np.abs(rng.randn(B, P, 4).astype(np.float32)) * 3  # relu'd preds
    ctr = rng.randn(B, P).astype(np.float32)

    gt = np.array([[[4, 4, 60, 60], [20, 20, 44, 44],
                    [10, 30, 62, 62], [0, 0, 0, 0]],
                   [[8, 8, 40, 48], [30, 6, 120, 100],
                    [0, 0, 0, 0], [0, 0, 0, 0]]], np.float32)
    labels = np.array([[2, 0, 1, 0], [3, 1, 0, 0]], np.int32)
    valid = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], bool)

    # ------------------------------------------------ reference composition
    single = load_ref_method(CONDINST, 'CondInstBoxHead',
                             '_get_target_single')
    ctr_target = load_ref_method(CONDINST, 'CondInstBoxHead',
                                 'centerness_target')
    utils_ns = load_ref('mmdet/models/losses/utils.py',
                        ['weight_reduce_loss', 'reduce_loss'])
    focal = load_ref('mmdet/models/losses/focal_loss.py',
                     ['py_sigmoid_focal_loss'], extra_ns=utils_ns)[
        'py_sigmoid_focal_loss']
    iou_ns = load_ref('mmdet/core/bbox/iou_calculators/iou2d_calculator.py',
                      ['bbox_overlaps', 'fp16_clamp'])
    giou = load_ref('mmdet/models/losses/iou_loss.py', ['giou_loss'],
                    extra_ns={**utils_ns, 'weighted_loss': lambda f: f,
                              'bbox_overlaps': iou_ns['bbox_overlaps']})[
        'giou_loss']
    d2b = load_ref('mmdet/core/bbox/transforms.py', ['distance2bbox'])[
        'distance2bbox']

    pts = _points()
    rr = np.concatenate([np.tile(r, (h * w, 1))
                         for (h, w), r in zip(LEVELS, RANGES)]).astype(
        np.float32)
    self = types.SimpleNamespace(center_sampling=True,
                                 center_sample_radius=1.5,
                                 strides=STRIDES, num_classes=C)
    per_img_labels, per_img_bt = [], []
    for i in range(B):
        n = int(valid[i].sum())
        li, bt, _ = single(self, to_torch(gt[i, :n]),
                           to_torch(labels[i, :n].astype(np.int64)),
                           to_torch(pts), to_torch(rr),
                           [h * w for h, w in LEVELS])
        per_img_labels.append(li)
        # norm_on_bbox: per-level stride division (reference get_targets)
        bt = bt.clone()
        start = 0
        for (h, w), s in zip(LEVELS, STRIDES):
            bt[start:start + h * w] /= s
            start += h * w
        per_img_bt.append(bt)
    fl = torch.cat(per_img_labels)                    # (B*P,)
    fbt = torch.cat(per_img_bt)
    fcls = to_torch(cls.reshape(-1, C))
    fbox = to_torch(bbox.reshape(-1, 4))
    fctr = to_torch(ctr.reshape(-1))
    fpts = to_torch(np.tile(pts, (B, 1)))

    pos = (fl >= 0) & (fl < C)
    num_pos = max(float(pos.sum()), 1.0)
    onehot = F.one_hot(fl, C + 1)[:, :C].float()
    want_cls = float(focal(fcls, onehot, gamma=2.0, alpha=0.25,
                           avg_factor=num_pos))
    pos_bt = fbt[pos]
    pos_ct = ctr_target(None, pos_bt)
    denorm = max(float(pos_ct.sum()), 1e-6)
    dp = d2b(fpts[pos], fbox[pos])
    dt = d2b(fpts[pos], pos_bt)
    want_bbox = float((giou(dp, dt) * pos_ct).sum() / denorm)
    want_ctr = float(F.binary_cross_entropy_with_logits(
        fctr[pos], pos_ct, reduction='sum') / num_pos)

    # ------------------------------------------------------ our head loss
    head = CondInstBoxHead(num_classes=C, strides=STRIDES,
                           regress_ranges=RANGES)
    # split flattened tensors back to per-level NHWC lists
    outs = {'cls': [], 'bbox': [], 'ctr': []}
    start = 0
    for (h, w) in LEVELS:
        sl = slice(start, start + h * w)
        outs['cls'].append(jnp.asarray(cls[:, sl].reshape(B, h, w, C)))
        outs['bbox'].append(jnp.asarray(bbox[:, sl].reshape(B, h, w, 4)))
        outs['ctr'].append(jnp.asarray(ctr[:, sl].reshape(B, h, w, 1)))
        start += h * w
    losses, _, _ = head.loss(outs, jnp.asarray(gt), jnp.asarray(labels),
                             jnp.asarray(valid))
    np.testing.assert_allclose(float(losses['loss_cls']), want_cls,
                               rtol=1e-4)
    np.testing.assert_allclose(float(losses['loss_bbox']), want_bbox,
                               rtol=1e-4)
    np.testing.assert_allclose(float(losses['loss_centerness']), want_ctr,
                               rtol=1e-4)
