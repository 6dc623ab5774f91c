"""Golden tests for the assigner zoo vs the reference's own torch
assigners (AST-extracted), plus property tests for the randomized
samplers (which cannot be golden-matched — different RNG streams)."""
import numpy as np
import pytest
import torch

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from ref_oracle import load_ref, ref_available  # noqa: E402

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason='reference tree not mounted')

ASSIGN_DIR = 'mmdet/core/bbox/assigners/'


class _AssignResult:
    def __init__(self, num_gts, gt_inds, max_overlaps, labels=None):
        self.num_gts = num_gts
        self.gt_inds = gt_inds
        self.max_overlaps = max_overlaps
        self.labels = labels
        self._extra = {}

    def set_extra_property(self, k, v):
        self._extra[k] = v


def _torch_iou(a, b, mode='iou', is_aligned=False, eps=1e-6):
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    a2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    if mode == 'iof':
        return inter / a1[:, None].clamp(min=eps)
    return inter / (a1[:, None] + a2[None, :] - inter).clamp(min=eps)


def _iou_calc(cfg=None):
    class C:
        def __call__(self, a, b, mode='iou'):
            return _torch_iou(a, b, mode)
    return C()


def _ns(fname, cls, extra=None):
    base = {'AssignResult': _AssignResult,
            'build_iou_calculator': _iou_calc,
            'BaseAssigner': object}
    if extra:
        base.update(extra)
    return load_ref(ASSIGN_DIR + fname, [cls], extra_ns=base)[cls]


def _boxes(rng, n, span=100):
    xy = rng.uniform(0, span, (n, 2))
    wh = rng.uniform(8, 40, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def _pad_gts(gt, K):
    k = gt.shape[0]
    out = np.zeros((K, 4), np.float32)
    out[:k] = gt
    valid = np.zeros((K,), bool)
    valid[:k] = True
    return out, valid


def test_golden_atss():
    from boxinstseg_tpu.core.targets import atss_assign
    rng = np.random.default_rng(0)
    levels = [64, 16, 4]
    bboxes = _boxes(rng, sum(levels))
    gt = _boxes(rng, 3)
    labels = rng.integers(0, 5, (3,))
    Ref = _ns('atss_assigner.py', 'ATSSAssigner')
    ref = Ref(topk=9)
    r = ref.assign(torch.from_numpy(bboxes), levels,
                   torch.from_numpy(gt), None,
                   torch.from_numpy(labels.astype(np.int64)))
    gtp, valid = _pad_gts(gt, 6)
    a, ov, lab = atss_assign(jnp.asarray(bboxes), levels,
                             jnp.asarray(gtp), jnp.asarray(valid),
                             topk=9, gt_labels=jnp.asarray(
                                 labels.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(a), r.gt_inds.numpy())
    np.testing.assert_array_equal(np.asarray(lab), r.labels.numpy())
    # max_overlaps: reference keeps -INF for unassigned; ours returns 0
    pos = r.gt_inds.numpy() > 0
    np.testing.assert_allclose(np.asarray(ov)[pos],
                               r.max_overlaps.numpy()[pos], rtol=1e-5)


def test_golden_point_assigner():
    from boxinstseg_tpu.core.targets import point_assign
    rng = np.random.default_rng(1)
    # points on strides 8/16/32
    pts = []
    for s, n in ((8, 40), (16, 20), (32, 10)):
        xy = rng.uniform(0, 200, (n, 2)).astype(np.float32)
        pts.append(np.concatenate(
            [xy, np.full((n, 1), s, np.float32)], 1))
    points = np.concatenate(pts, 0)
    gt = _boxes(rng, 4, span=150)
    labels = rng.integers(0, 5, (4,))
    Ref = _ns('point_assigner.py', 'PointAssigner')
    ref = Ref(scale=4, pos_num=3)
    r = ref.assign(torch.from_numpy(points), torch.from_numpy(gt), None,
                   torch.from_numpy(labels.astype(np.int64)))
    gtp, valid = _pad_gts(gt, 8)
    a, _, lab = point_assign(jnp.asarray(points), jnp.asarray(gtp),
                             jnp.asarray(valid), scale=4, pos_num=3,
                             gt_labels=jnp.asarray(
                                 labels.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(a), r.gt_inds.numpy())
    np.testing.assert_array_equal(np.asarray(lab), r.labels.numpy())


def test_golden_grid_assigner():
    from boxinstseg_tpu.core.targets import grid_assign
    rng = np.random.default_rng(2)
    bboxes = _boxes(rng, 60)
    flags = rng.random(60) > 0.3
    gt = _boxes(rng, 4)
    labels = rng.integers(0, 5, (4,))
    Ref = _ns('grid_assigner.py', 'GridAssigner')
    ref = Ref(pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.0)
    r = ref.assign(torch.from_numpy(bboxes), torch.from_numpy(flags),
                   torch.from_numpy(gt),
                   torch.from_numpy(labels.astype(np.int64)))
    gtp, valid = _pad_gts(gt, 8)
    a, ov, lab = grid_assign(jnp.asarray(bboxes), jnp.asarray(flags),
                             jnp.asarray(gtp), jnp.asarray(valid),
                             pos_iou_thr=0.5, neg_iou_thr=0.3,
                             gt_labels=jnp.asarray(
                                 labels.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(a), r.gt_inds.numpy())
    np.testing.assert_array_equal(np.asarray(lab), r.labels.numpy())


def test_golden_task_aligned():
    from boxinstseg_tpu.core.targets import task_aligned_assign
    rng = np.random.default_rng(3)
    n, k, C = 80, 3, 5
    anchors = _boxes(rng, n)
    decoded = _boxes(rng, n)
    scores = rng.random((n, C)).astype(np.float32)
    gt = _boxes(rng, k)
    labels = rng.integers(0, C, (k,))
    Ref = _ns('task_aligned_assigner.py', 'TaskAlignedAssigner',
              extra={'INF': 100000000})
    ref = Ref(topk=13)
    r = ref.assign(torch.from_numpy(scores), torch.from_numpy(decoded),
                   torch.from_numpy(anchors), torch.from_numpy(gt), None,
                   torch.from_numpy(labels.astype(np.int64)))
    gtp, valid = _pad_gts(gt, 6)
    lp = np.zeros((6,), np.int32)
    lp[:k] = labels
    a, ov, lab, met = task_aligned_assign(
        jnp.asarray(scores), jnp.asarray(decoded), jnp.asarray(anchors),
        jnp.asarray(gtp), jnp.asarray(valid), jnp.asarray(lp), topk=13)
    np.testing.assert_array_equal(np.asarray(a), r.gt_inds.numpy())
    pos = r.gt_inds.numpy() > 0
    np.testing.assert_allclose(np.asarray(met)[pos],
                               r.assign_metrics.numpy()[pos], rtol=1e-4)


def test_golden_sim_ota():
    import torch.nn.functional  # noqa: F401
    from boxinstseg_tpu.core.targets import sim_ota_assign
    rng = np.random.default_rng(4)
    n, k, C = 120, 3, 5
    # priors: (cx, cy, stride_x, stride_y)
    priors = np.stack([rng.uniform(0, 150, n), rng.uniform(0, 150, n),
                       np.full(n, 8.0), np.full(n, 8.0)],
                      1).astype(np.float32)
    decoded = _boxes(rng, n, span=150)
    scores = rng.random((n, C)).astype(np.float32)
    gt = _boxes(rng, k, span=120)
    labels = rng.integers(0, C, (k,))
    Ref = _ns('sim_ota_assigner.py', 'SimOTAAssigner',
              extra={'bbox_overlaps': _torch_iou})
    ref = Ref(center_radius=2.5, candidate_topk=10)
    r = ref._assign(torch.from_numpy(scores), torch.from_numpy(priors),
                    torch.from_numpy(decoded), torch.from_numpy(gt),
                    torch.from_numpy(labels.astype(np.int64)))
    gtp, valid = _pad_gts(gt, 6)
    lp = np.zeros((6,), np.int32)
    lp[:k] = labels
    a, ov, lab = sim_ota_assign(
        jnp.asarray(scores), jnp.asarray(priors), jnp.asarray(decoded),
        jnp.asarray(gtp), jnp.asarray(valid), jnp.asarray(lp),
        center_radius=2.5, candidate_topk=10)
    np.testing.assert_array_equal(np.asarray(a), r.gt_inds.numpy())
    np.testing.assert_array_equal(np.asarray(lab), r.labels.numpy())


def test_golden_uniform():
    from boxinstseg_tpu.core.targets import uniform_assign

    def cxcywh(t):
        return torch.stack([(t[:, 0] + t[:, 2]) / 2,
                            (t[:, 1] + t[:, 3]) / 2,
                            t[:, 2] - t[:, 0], t[:, 3] - t[:, 1]], -1)

    rng = np.random.default_rng(5)
    n, k = 90, 3
    pred = _boxes(rng, n)
    anchor = _boxes(rng, n)
    gt = _boxes(rng, k)
    labels = rng.integers(0, 5, (k,))
    Ref = _ns('uniform_assigner.py', 'UniformAssigner',
              extra={'bbox_xyxy_to_cxcywh': cxcywh})
    ref = Ref(pos_ignore_thr=0.15, neg_ignore_thr=0.7, match_times=4)
    r = ref.assign(torch.from_numpy(pred), torch.from_numpy(anchor),
                   torch.from_numpy(gt), None,
                   torch.from_numpy(labels.astype(np.int64)))
    gtp, valid = _pad_gts(gt, 6)
    a, ov, lab = uniform_assign(
        jnp.asarray(pred), jnp.asarray(anchor), jnp.asarray(gtp),
        jnp.asarray(valid), pos_ignore_thr=0.15, neg_ignore_thr=0.7,
        match_times=4,
        gt_labels=jnp.asarray(labels.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(a), r.gt_inds.numpy())


def test_golden_approx_max_iou():
    from boxinstseg_tpu.core.targets import approx_max_iou_assign
    rng = np.random.default_rng(6)
    num_sq, per_oct, k = 30, 3, 4
    approxs = _boxes(rng, num_sq * per_oct)
    squares = _boxes(rng, num_sq)
    gt = _boxes(rng, k)
    labels = rng.integers(0, 5, (k,))

    # reference: assign_wrt_overlaps comes from MaxIoUAssigner
    MaxIoU = _ns('max_iou_assigner.py', 'MaxIoUAssigner')
    Approx = _ns('approx_max_iou_assigner.py', 'ApproxMaxIoUAssigner',
                 extra={'MaxIoUAssigner': MaxIoU})
    ref = Approx(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.2)
    r = ref.assign(torch.from_numpy(approxs), torch.from_numpy(squares),
                   per_oct, torch.from_numpy(gt), None,
                   torch.from_numpy(labels.astype(np.int64)))
    gtp, valid = _pad_gts(gt, 8)
    a, ov, lab = approx_max_iou_assign(
        jnp.asarray(approxs), jnp.asarray(squares), per_oct,
        jnp.asarray(gtp), jnp.asarray(valid), pos_iou_thr=0.5,
        neg_iou_thr=0.4, min_pos_iou=0.2,
        gt_labels=jnp.asarray(labels.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(a), r.gt_inds.numpy())
    np.testing.assert_allclose(np.asarray(ov), r.max_overlaps.numpy()
                               .clip(0), rtol=1e-5)


def test_hungarian_bbox_assign_optimal():
    """On-device Hungarian bbox assign: every valid gt matched once, and
    the matching minimizes the same cost scipy minimizes."""
    from scipy.optimize import linear_sum_assignment

    from boxinstseg_tpu.core.targets import (bbox_l1_cost,
                                             focal_loss_cost,
                                             hungarian_bbox_assign,
                                             iou_cost)
    rng = np.random.default_rng(7)
    q, k, C = 20, 4, 5
    cls_pred = rng.normal(size=(q, C)).astype(np.float32)
    bbox_pred = rng.random((q, 4)).astype(np.float32) * 0.5 + 0.25
    gt = _boxes(rng, k, span=100)
    labels = rng.integers(0, C, (k,))
    img_shape = (120, 160)
    gtp, valid = _pad_gts(gt, 6)
    lp = np.zeros((6,), np.int32)
    lp[:k] = labels

    a, _, lab = hungarian_bbox_assign(
        jnp.asarray(bbox_pred), jnp.asarray(cls_pred), jnp.asarray(gtp),
        jnp.asarray(valid), jnp.asarray(lp), img_shape)
    a = np.asarray(a)
    # each valid gt assigned exactly once
    for g in range(1, k + 1):
        assert (a == g).sum() == 1
    # optimal total cost == scipy on the same cost matrix
    factor = np.array([img_shape[1], img_shape[0], img_shape[1],
                       img_shape[0]], np.float32)
    cls_c = np.asarray(focal_loss_cost(jnp.asarray(cls_pred),
                                       jnp.asarray(labels.astype(
                                           np.int32))))
    reg_c = np.asarray(bbox_l1_cost(jnp.asarray(bbox_pred),
                                    jnp.asarray(gt / factor)))
    cx, cy, w, h = bbox_pred.T
    xyxy = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                    -1) * factor
    iou_c = np.asarray(iou_cost(jnp.asarray(xyxy), jnp.asarray(gt)))
    cost = cls_c + reg_c + iou_c
    rows, cols = linear_sum_assignment(cost)
    want = cost[rows, cols].sum()
    got = sum(cost[i, a[i] - 1] for i in range(q) if a[i] > 0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_samplers_properties():
    from boxinstseg_tpu.core.targets import (combined_sample,
                                             instance_balanced_pos_sample,
                                             iou_balanced_neg_sample,
                                             ohem_sample)
    rng = np.random.default_rng(8)
    n = 200
    assigned = np.zeros((n,), np.int32)
    assigned[:40] = rng.integers(1, 5, (40,))      # 40 positives, 4 gts
    ious = rng.random(n).astype(np.float32)
    key = jax.random.PRNGKey(0)

    pos = instance_balanced_pos_sample(jnp.asarray(assigned), key, 16)
    pos = np.asarray(pos)
    assert pos.sum() == 16 and (assigned[pos] > 0).all()
    # per-gt cap: round(16/4)+1 = 5 before top-up; after top-up each gt
    # may exceed, but selection must cover every gt that has positives
    for g in np.unique(assigned[assigned > 0]):
        assert pos[assigned == g].sum() >= 1

    neg = iou_balanced_neg_sample(jnp.asarray(assigned),
                                  jnp.asarray(ious), key, 32,
                                  floor_thr=0.3, floor_fraction=0.5)
    neg = np.asarray(neg)
    assert neg.sum() == 32 and (assigned[neg] == 0).all()

    loss = rng.random(n).astype(np.float32)
    p2, n2 = ohem_sample(jnp.asarray(assigned), jnp.asarray(loss), 64,
                         0.25)
    p2, n2 = np.asarray(p2), np.asarray(n2)
    assert p2.sum() == 16 and n2.sum() == 48
    # hardest positives kept: min selected loss >= max dropped loss
    sel, drop = loss[p2], loss[(assigned > 0) & ~p2]
    assert sel.min() >= drop.max() - 1e-6

    p3, n3 = combined_sample(jnp.asarray(assigned), jnp.asarray(ious),
                             key, 64, 0.25, floor_thr=0.3,
                             floor_fraction=0.5)
    assert np.asarray(p3).sum() == 16 and np.asarray(n3).sum() == 48


def test_score_hlr_sampler_properties():
    from boxinstseg_tpu.core.targets import score_hlr_neg_sample
    rng = np.random.default_rng(9)
    n = 120
    assigned = np.zeros((n,), np.int32)
    assigned[:10] = 1
    scores = rng.random(n).astype(np.float32)
    boxes = _boxes(rng, n)
    sel, w = score_hlr_neg_sample(
        jnp.asarray(assigned), jnp.asarray(scores), jnp.asarray(boxes),
        jax.random.PRNGKey(1), 32, score_thr=0.05, iou_thr=0.5, k=0.5,
        bias=0.0)
    sel, w = np.asarray(sel), np.asarray(w)
    assert sel.sum() == 32 and (assigned[sel] == 0).all()
    assert (w[sel] > 0).all() and (w[~sel] == 0).all()
    # hard (high-score) negatives must dominate the selection
    valid = (assigned == 0) & (scores > 0.05)
    assert sel[valid].sum() >= 31  # at most 1 random filler here
