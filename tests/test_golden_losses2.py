"""Second golden batch: classification losses, match costs, and the
DiscoBox correspondence solver vs the reference's own torch code
(AST-extracted at test time, see ref_oracle.py)."""
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from ref_oracle import load_ref, ref_available, to_np, to_torch

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason='reference tree not mounted')

FOCAL = 'mmdet/models/losses/focal_loss.py'
IOU = 'mmdet/models/losses/iou_loss.py'
UTILS = 'mmdet/models/losses/utils.py'
MATCH = 'mmdet/core/bbox/match_costs/match_cost.py'
DISCOBOX = 'mmdet/models/dense_heads/discobox_head.py'


def test_golden_sigmoid_focal_loss(rng):
    import torch.nn.functional as F
    from boxinstseg_tpu.models.losses.focal_loss import FocalLoss
    ns = load_ref(FOCAL, ['py_sigmoid_focal_loss'],
                  extra_ns=load_ref(UTILS, ['weight_reduce_loss',
                                            'reduce_loss']))
    pred = rng.randn(40, 7).astype(np.float32) * 3
    target = rng.randint(0, 8, 40)       # 7 = background
    onehot = np.zeros((40, 7), np.float32)
    sel = target < 7
    onehot[np.nonzero(sel)[0], target[sel]] = 1
    want = float(ns['py_sigmoid_focal_loss'](
        to_torch(pred), to_torch(onehot), gamma=2.0, alpha=0.25,
        avg_factor=13.0))
    loss = FocalLoss(use_sigmoid=True, gamma=2.0, alpha=0.25,
                     loss_weight=1.0)
    got = float(loss(jnp.asarray(pred), jnp.asarray(target),
                     avg_factor=13.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_golden_giou_loss(rng):
    from boxinstseg_tpu.models.losses.iou_loss import GIoULoss
    iou_ns = load_ref(
        'mmdet/core/bbox/iou_calculators/iou2d_calculator.py',
        ['bbox_overlaps', 'fp16_clamp'])
    bbox_overlaps = iou_ns['bbox_overlaps']
    ns = load_ref(IOU, ['giou_loss'],
                  extra_ns={**load_ref(UTILS, ['weight_reduce_loss',
                                               'reduce_loss']),
                            'weighted_loss': lambda f: f,
                            'bbox_overlaps': bbox_overlaps})
    n = 24
    pred = np.abs(rng.randn(n, 4).astype(np.float32)) * 30
    pred[:, 2:] += pred[:, :2] + 1
    target = np.abs(rng.randn(n, 4).astype(np.float32)) * 30
    target[:, 2:] += target[:, :2] + 1
    want = to_np(ns['giou_loss'](to_torch(pred), to_torch(target)))
    loss = GIoULoss(loss_weight=1.0)
    w = rng.rand(n).astype(np.float32)
    got_w = float(loss(jnp.asarray(pred), jnp.asarray(target),
                       weight=jnp.asarray(w), avg_factor=7.0))
    np.testing.assert_allclose(got_w, (want * w).sum() / 7.0, rtol=1e-4)


def test_golden_box_matching_cost(rng):
    from boxinstseg_tpu.core.targets.hungarian import (box_matching_cost,
                                                       classification_cost)
    ns = load_ref(MATCH, ['BoxMatchingCost', 'ClassificationCost'])
    q, g, h, w = 6, 4, 16, 16
    logits = rng.randn(q, h, w).astype(np.float32) * 2
    gt = np.zeros((g, h, w), np.float32)
    for i in range(g):
        x1, y1 = rng.randint(0, 8, 2)
        gt[i, y1:y1 + rng.randint(4, 8), x1:x1 + rng.randint(4, 8)] = 1

    ref_cost = ns['BoxMatchingCost'](weight=1.0, pred_act=True, eps=1.0)
    want = to_np(ref_cost(to_torch(logits)[:, None],
                          to_torch(gt)[:, None]))
    got = np.asarray(box_matching_cost(jnp.asarray(logits)[None],
                                       jnp.asarray(gt)[None], eps=1.0))[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    cls_scores = rng.randn(q, 5).astype(np.float32)
    labels = rng.randint(0, 4, g)
    ref_cls = ns['ClassificationCost'](weight=1.0)
    want_c = to_np(ref_cls(to_torch(cls_scores),
                           to_torch(labels.astype(np.int64))))
    got_c = np.asarray(classification_cost(
        jnp.asarray(cls_scores)[None],
        jnp.asarray(labels.astype(np.int32))[None]))[0]
    np.testing.assert_allclose(got_c, want_c, rtol=1e-4, atol=1e-6)


def test_golden_correspondence_solver(rng):
    """Regularized Hough matching (Cu cosine cost, distance-kernel seed,
    diagonal message passing) vs the reference SemanticCorrSolver.solve
    (discobox_head.py:369-411)."""
    import math
    import torch
    import torch.nn.functional as F
    from torch.cuda.amp import autocast
    from boxinstseg_tpu.ops.correspondence import (pass_message,
                                                   solve_correspondence)

    Solver = load_ref(DISCOBOX, ['SemanticCorrSolver'],
                      extra_ns=dict(math=math, autocast=autocast))[
        'SemanticCorrSolver']
    solver = Solver(exp=1.0, eps=0.05, gaussian_filter_size=3,
                    low_score=0.1, num_iter=4, num_smooth_iter=2,
                    dist_kernel=5)

    b, c, fh, fw = 3, 8, 7, 7
    mh, mw = 28, 28
    f0 = np.abs(rng.randn(b, c, fh, fw)).astype(np.float32)
    f1 = np.abs(rng.randn(b, c, fh, fw)).astype(np.float32)
    m0 = (rng.rand(b, mh, mw) > 0.5).astype(np.float32)
    m1 = (rng.rand(b, mh, mw) > 0.5).astype(np.float32)

    qobjs = types.SimpleNamespace(mask=to_torch(m0))
    kobjs = {'feature': to_torch(f1), 'mask': to_torch(m1)}
    with torch.no_grad():
        cu_t, c_t, fg_t, bg_t = solver.solve(qobjs, kobjs, to_torch(f0))

    q_cells = jnp.asarray(f0.reshape(b, c, -1).transpose(0, 2, 1))
    k_cells = jnp.asarray(f1.reshape(b, c, -1).transpose(0, 2, 1))
    cu_j, t_j = solve_correspondence(q_cells, k_cells, (fh, fw),
                                     num_iter=4, num_smooth_iter=2,
                                     dist_kernel=5)
    np.testing.assert_allclose(np.asarray(cu_j), to_np(cu_t),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_j), to_np(c_t),
                               rtol=1e-3, atol=1e-5)

    # pass_message in isolation
    t0 = np.abs(rng.randn(2, fh * fw, fh * fw)).astype(np.float32)
    want_pm = to_np(solver.pass_message(to_torch(t0).clone(), (fh, fw)))
    got_pm = np.asarray(pass_message(jnp.asarray(t0), (fh, fw)))
    np.testing.assert_allclose(got_pm, want_pm, rtol=1e-5, atol=1e-6)


def test_golden_aux_losses(rng):
    """Auxiliary loss zoo vs the reference formulas (smooth_l1_loss.py,
    mse_loss.py, gaussian_focal_loss.py, varifocal_loss.py)."""
    from boxinstseg_tpu.models.losses import (GaussianFocalLoss, L1Loss,
                                              MSELoss, SmoothL1Loss,
                                              VarifocalLoss)
    utils_ns = load_ref(UTILS, ['weight_reduce_loss', 'reduce_loss'])
    base = {**utils_ns, 'weighted_loss': lambda f: f}
    sl1 = load_ref('mmdet/models/losses/smooth_l1_loss.py',
                   ['smooth_l1_loss', 'l1_loss'], extra_ns=base)
    mse = load_ref('mmdet/models/losses/mse_loss.py', ['mse_loss'],
                   extra_ns=base)
    gf = load_ref('mmdet/models/losses/gaussian_focal_loss.py',
                  ['gaussian_focal_loss'], extra_ns=base)
    vf = load_ref('mmdet/models/losses/varifocal_loss.py',
                  ['varifocal_loss'], extra_ns=base)

    pred = rng.randn(30, 4).astype(np.float32)
    tgt = rng.randn(30, 4).astype(np.float32)
    np.testing.assert_allclose(
        float(SmoothL1Loss(beta=0.5)(pred, tgt)),
        float(sl1['smooth_l1_loss'](to_torch(pred), to_torch(tgt),
                                    beta=0.5).mean()), rtol=1e-5)
    np.testing.assert_allclose(
        float(L1Loss()(pred, tgt)),
        float(sl1['l1_loss'](to_torch(pred), to_torch(tgt)).mean()),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(MSELoss()(pred, tgt)),
        float(mse['mse_loss'](to_torch(pred), to_torch(tgt)).mean()),
        rtol=1e-5)

    heat = rng.rand(20, 6).astype(np.float32)
    gtgt = rng.rand(20, 6).astype(np.float32)
    gtgt[rng.rand(20, 6) > 0.8] = 1.0
    np.testing.assert_allclose(
        float(GaussianFocalLoss()(heat, gtgt)),
        float(gf['gaussian_focal_loss'](to_torch(heat),
                                        to_torch(gtgt)).mean()),
        rtol=1e-4)

    logits = rng.randn(20, 6).astype(np.float32)
    vtgt = (rng.rand(20, 6) * (rng.rand(20, 6) > 0.7)).astype(np.float32)
    np.testing.assert_allclose(
        float(VarifocalLoss()(logits, vtgt)),
        float(vf['varifocal_loss'](to_torch(logits), to_torch(vtgt),
                                   reduction='mean')), rtol=1e-4)
