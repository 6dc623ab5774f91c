"""Golden tests: eval_map (VOC mAP) and MaxIoUAssigner vs the
reference's own numpy/torch implementations, traced from source."""
import types

import numpy as np
import pytest

import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from ref_oracle import load_ref, load_ref_method, ref_available, to_np, \
    to_torch

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason='reference tree not mounted')

MEAN_AP = 'mmdet/core/evaluation/mean_ap.py'


def _random_eval_case(rng, n_imgs=6, n_cls=3, with_ignore=True):
    dets, anns = [], []
    for _ in range(n_imgs):
        per_cls = []
        for _ in range(n_cls):
            m = rng.randint(0, 8)
            xy = rng.rand(m, 2) * 80
            wh = rng.rand(m, 2) * 40 + 4
            scores = rng.rand(m, 1)
            per_cls.append(np.concatenate(
                [xy, xy + wh, scores], -1).astype(np.float32))
        dets.append(per_cls)
        k = rng.randint(0, 6)
        xy = rng.rand(k, 2) * 80
        wh = rng.rand(k, 2) * 40 + 4
        ann = dict(bboxes=np.concatenate([xy, xy + wh], -1).astype(
            np.float32), labels=rng.randint(0, n_cls, k))
        if with_ignore:
            ki = rng.randint(0, 3)
            xy = rng.rand(ki, 2) * 80
            wh = rng.rand(ki, 2) * 30 + 4
            ann['bboxes_ignore'] = np.concatenate(
                [xy, xy + wh], -1).astype(np.float32)
            ann['labels_ignore'] = rng.randint(0, n_cls, ki)
        anns.append(ann)
    return dets, anns


def _ref_eval_map():
    ov = load_ref('mmdet/core/evaluation/bbox_overlaps.py',
                  ['bbox_overlaps'])
    ns = dict(bbox_overlaps=ov['bbox_overlaps'],
              print_map_summary=lambda *a, **k: None,
              Pool=__import__('multiprocessing.dummy',
                              fromlist=['Pool']).Pool)
    fns = load_ref(MEAN_AP, ['average_precision', 'tpfp_default',
                             'get_cls_results', 'eval_map'], extra_ns=ns)
    return fns['eval_map']


@pytest.mark.parametrize('mode', ['area', 'voc07', 'scales', 'legacy'])
def test_golden_eval_map(mode, rng):
    from boxinstseg_tpu.core.eval.mean_ap import eval_map

    dets, anns = _random_eval_case(rng)
    ref_eval = _ref_eval_map()
    kw = {}
    if mode == 'voc07':
        kw = dict(dataset='voc07')
    elif mode == 'scales':
        kw = dict(scale_ranges=[(0, 32), (32, 1e5)])
    elif mode == 'legacy':
        kw = dict(use_legacy_coordinate=True)
    want_map, want_res = ref_eval(dets, anns, nproc=1, **kw)
    got_map, got_res = eval_map(dets, anns, logger='silent', **kw)
    np.testing.assert_allclose(got_map, want_map, rtol=1e-6, atol=1e-7)
    for g, w in zip(got_res, want_res):
        np.testing.assert_allclose(g['ap'], w['ap'], rtol=1e-6, atol=1e-7)
        assert np.all(np.asarray(g['num_gts']) == np.asarray(w['num_gts']))


@pytest.mark.parametrize('cfg', [
    dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.2),
    dict(pos_iou_thr=0.7, neg_iou_thr=(0.2, 0.5), min_pos_iou=0.3,
         gt_max_assign_all=False),
    dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0,
         match_low_quality=False),
    dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.2,
         ignore_iof_thr=0.5),
])
def test_golden_max_iou_assigner(cfg, rng):
    import torch
    from boxinstseg_tpu.core.targets.assigners import max_iou_assign

    iou_ns = load_ref(
        'mmdet/core/bbox/iou_calculators/iou2d_calculator.py',
        ['bbox_overlaps', 'fp16_clamp'])

    assign_wrt = load_ref_method(
        'mmdet/core/bbox/assigners/max_iou_assigner.py',
        'MaxIoUAssigner', 'assign_wrt_overlaps',
        extra_ns=dict(AssignResult=lambda num_gts, gt_inds, max_overlaps,
                      labels=None: types.SimpleNamespace(
                          gt_inds=gt_inds, max_overlaps=max_overlaps,
                          labels=labels)))
    assign = load_ref_method(
        'mmdet/core/bbox/assigners/max_iou_assigner.py',
        'MaxIoUAssigner', 'assign')

    n, k = 40, 5
    xy = rng.rand(n, 2) * 60
    wh = rng.rand(n, 2) * 30 + 4
    bboxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    xy = rng.rand(k, 2) * 60
    wh = rng.rand(k, 2) * 30 + 4
    gts = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    labels = rng.randint(0, 7, k)
    ign = np.array([[0, 0, 50, 50]], np.float32)

    self = types.SimpleNamespace(
        pos_iou_thr=cfg['pos_iou_thr'], neg_iou_thr=cfg['neg_iou_thr'],
        min_pos_iou=cfg['min_pos_iou'],
        gt_max_assign_all=cfg.get('gt_max_assign_all', True),
        match_low_quality=cfg.get('match_low_quality', True),
        ignore_iof_thr=cfg.get('ignore_iof_thr', -1),
        ignore_wrt_candidates=True, gpu_assign_thr=-1,
        iou_calculator=iou_ns['bbox_overlaps'],
        assign_wrt_overlaps=lambda ov, gt_labels=None: assign_wrt(
            self, ov, gt_labels))
    want = assign(self, to_torch(bboxes), to_torch(gts),
                  gt_bboxes_ignore=to_torch(ign)
                  if cfg.get('ignore_iof_thr', -1) > 0 else None,
                  gt_labels=to_torch(labels.astype(np.int64)))

    got_inds, got_max, got_labels = max_iou_assign(
        jnp.asarray(bboxes), jnp.asarray(gts), jnp.ones(k, bool),
        gt_labels=jnp.asarray(labels),
        gt_bboxes_ignore=jnp.asarray(ign)
        if cfg.get('ignore_iof_thr', -1) > 0 else None,
        **cfg)
    np.testing.assert_array_equal(np.asarray(got_inds),
                                  to_np(want.gt_inds))
    np.testing.assert_array_equal(np.asarray(got_labels),
                                  to_np(want.labels))
    np.testing.assert_allclose(np.asarray(got_max),
                               np.clip(to_np(want.max_overlaps), 0, None),
                               rtol=1e-5, atol=1e-6)


def test_max_iou_assign_padded_gts_match_unpadded(rng):
    """Padding rows with gt_valid=False must not change the assignment."""
    from boxinstseg_tpu.core.targets.assigners import max_iou_assign
    n, k = 20, 3
    xy = rng.rand(n, 2) * 60
    wh = rng.rand(n, 2) * 30 + 4
    bboxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    xy = rng.rand(k, 2) * 60
    wh = rng.rand(k, 2) * 30 + 4
    gts = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    a1, m1, _ = max_iou_assign(bboxes, jnp.asarray(gts),
                               jnp.ones(k, bool))
    padded = np.concatenate([gts, np.zeros((4, 4), np.float32)])
    valid = np.array([True] * k + [False] * 4)
    a2, m2, _ = max_iou_assign(bboxes, jnp.asarray(padded),
                               jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)


def test_random_sampler_budget(rng):
    from boxinstseg_tpu.core.targets.assigners import random_sample
    import jax
    assigned = jnp.asarray(rng.choice([0, 0, 0, 1, 2], 64))
    pos, neg = random_sample(assigned, jax.random.PRNGKey(0), num=16,
                             pos_fraction=0.25)
    assert int(pos.sum()) <= 4
    assert int(pos.sum()) + int(neg.sum()) <= 16
    assert bool(jnp.all(assigned[pos] > 0))
    assert bool(jnp.all(assigned[neg] == 0))


def test_dataset_voc_map_metric(tmp_path):
    """CocoDataset.evaluate(metric='mAP') routes through eval_map and
    returns 1.0 for perfect detections (reference capability:
    XMLDataset.evaluate metric='mAP')."""
    import json
    from boxinstseg_tpu.registry import build_dataset

    images = [dict(id=i + 1, width=100, height=80, file_name=f'{i}.jpg')
              for i in range(3)]
    anns, aid = [], 1
    for i in range(3):
        for (x, y, w, h, c) in [(10, 10, 20, 20, 7), (50, 30, 30, 25, 9)]:
            anns.append(dict(id=aid, image_id=i + 1, category_id=c,
                             bbox=[x, y, w, h], area=w * h, iscrowd=0))
            aid += 1
    ann_file = str(tmp_path / 'gt.json')
    with open(ann_file, 'w') as f:
        json.dump(dict(images=images, annotations=anns,
                       categories=[dict(id=7, name='cat'),
                                   dict(id=9, name='dog')]), f)
    ds = build_dataset(dict(type='CocoDataset', ann_file=ann_file,
                            img_prefix=str(tmp_path), pipeline=[],
                            classes=('cat', 'dog'), test_mode=True))
    results = [dict(bboxes=np.array([[10, 10, 30, 30, .9],
                                     [50, 30, 80, 55, .8]], np.float32),
                    labels=np.array([0, 1])) for _ in range(3)]
    out = ds.evaluate(results, metric='mAP')
    assert out['mAP'] == pytest.approx(1.0)
    # one class entirely missed -> mAP 0.5
    half = [dict(bboxes=r['bboxes'][:1], labels=r['labels'][:1])
            for r in results]
    assert ds.evaluate(half, metric='mAP')['mAP'] == pytest.approx(0.5)
