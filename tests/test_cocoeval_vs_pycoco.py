"""Validate boxinstseg_tpu's COCOeval reimplementation against a faithful
transcription of the pycocotools protocol (tests/oracles/pycoco_cocoeval.py).

The reference evaluates through pycocotools COCOeval (reference:
mmdet/datasets/coco.py:386-649); pycocotools itself cannot be installed
here, so the oracle transcribes its exact algorithm. Fixtures are
randomized and adversarial: crowd annotations, explicit ignore flags,
all three area buckets populated, duplicate scores (stable-sort
tie-breaking), empty images, categories with detections but no gt,
detections truncated by maxDets, and masks touching image borders.
Detection masks round-trip through the package's compressed-RLE codec so
the codec is validated on the same path.
"""
import numpy as np
import pytest

from boxinstseg_tpu.core.eval.coco_eval import COCOEvaluator
from boxinstseg_tpu.data.coco_api import COCO, rle_encode

from oracles.pycoco_cocoeval import OracleCOCOeval


def _rect_mask(h, w, rs, min_size=2, max_frac=0.9):
    mh = rs.randint(min_size, max(min_size + 1, int(h * max_frac)))
    mw = rs.randint(min_size, max(min_size + 1, int(w * max_frac)))
    y = rs.randint(0, h - mh + 1)
    x = rs.randint(0, w - mw + 1)
    m = np.zeros((h, w), np.uint8)
    m[y:y + mh, x:x + mw] = 1
    return m


def _mask_to_xywh(m):
    ys, xs = np.nonzero(m)
    return [float(xs.min()), float(ys.min()),
            float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)]


def _jitter(m, rs):
    dy, dx = rs.randint(-4, 5, size=2)
    out = np.zeros_like(m)
    h, w = m.shape
    ys = slice(max(0, dy), min(h, h + dy))
    yd = slice(max(0, -dy), min(h, h - dy))
    xs = slice(max(0, dx), min(w, w + dx))
    xd = slice(max(0, -dx), min(w, w - dx))
    out[ys, xs] = m[yd, xd]
    if not out.any():
        out = m.copy()
    return out


def make_fixture(seed, n_imgs=16, n_cats=4):
    rs = np.random.RandomState(seed)
    images, gt_anns, dts = [], [], []
    ann_id = 1
    for img_id in range(1, n_imgs + 1):
        # big images so small/medium/large area buckets all get members
        h, w = int(rs.randint(48, 180)), int(rs.randint(48, 180))
        images.append(dict(id=img_id, height=h, width=w))
        if rs.rand() < 0.12:     # empty image (dets only, maybe)
            n_gt = 0
        else:
            n_gt = rs.randint(1, 8)
        for _ in range(n_gt):
            m = _rect_mask(h, w, rs)
            if rs.rand() < 0.3:  # irregular: union of two rectangles
                m = np.maximum(m, _rect_mask(h, w, rs))
            iscrowd = int(rs.rand() < 0.15)
            ann = dict(
                id=ann_id, image_id=img_id,
                category_id=int(rs.randint(1, n_cats + 1)),
                bbox=_mask_to_xywh(m), area=float(m.sum()),
                iscrowd=iscrowd, mask=m)
            if rs.rand() < 0.1:
                ann['ignore'] = 1
            gt_anns.append(ann)
            ann_id += 1
            # detections: jittered true positives (sometimes wrong class)
            if rs.rand() < 0.85:
                dm = _jitter(m, rs)
                cat = ann['category_id'] if rs.rand() < 0.9 \
                    else int(rs.randint(1, n_cats + 1))
                dts.append(dict(image_id=img_id, category_id=cat,
                                bbox=_mask_to_xywh(dm),
                                score=float(np.round(rs.rand(), 2)),
                                mask=dm))
            if dts and rs.rand() < 0.25:  # duplicate det w/ tied score
                dts.append(dict(dts[-1]))
        # false positives, incl. score ties across images
        for _ in range(rs.randint(0, 4)):
            fm = _rect_mask(h, w, rs)
            dts.append(dict(image_id=img_id,
                            category_id=int(rs.randint(1, n_cats + 1)),
                            bbox=_mask_to_xywh(fm),
                            score=float(np.round(rs.rand(), 1)),
                            mask=fm))
    return images, gt_anns, dts


def _run_package(images, gt_anns, dts, cat_ids, iou_type):
    gt_json = dict(
        images=images,
        categories=[dict(id=c, name=str(c)) for c in cat_ids],
        annotations=[
            {**{k: v for k, v in a.items() if k != 'mask'},
             'segmentation': rle_encode(a['mask'])} for a in gt_anns])
    coco = COCO(dataset=gt_json)
    img_ids = [im['id'] for im in images]
    dets = {i: {} for i in img_ids}
    for d in dts:
        entry = dets[d['image_id']].setdefault(
            d['category_id'],
            dict(bboxes=[], scores=[], masks=[]))
        entry['bboxes'].append(d['bbox'])
        entry['scores'].append(d['score'])
        entry['masks'].append(rle_encode(d['mask']))
    ev = COCOEvaluator(coco, img_ids, cat_ids, iou_type=iou_type)
    acc = ev.evaluate(dets)
    return acc, COCOEvaluator.summarize(acc)


PKG_TO_ORACLE = ['mAP', 'mAP_50', 'mAP_75', 'mAP_s', 'mAP_m', 'mAP_l',
                 'AR@1', 'AR@10', 'AR@100', 'AR_s@100', 'AR_m@100',
                 'AR_l@100']


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('iou_type', ['bbox', 'segm'])
def test_cocoeval_matches_pycocotools_protocol(seed, iou_type):
    images, gt_anns, dts = make_fixture(seed)
    cat_ids = [1, 2, 3, 4]
    img_ids = [im['id'] for im in images]

    oracle = OracleCOCOeval(gt_anns, dts, img_ids, cat_ids, iou_type)
    o_acc = oracle.evaluate_and_accumulate()
    o_stats = oracle.summarize()

    acc, summary = _run_package(images, gt_anns, dts, cat_ids, iou_type)

    np.testing.assert_allclose(
        acc['precision'], o_acc['precision'], atol=1e-9,
        err_msg=f'precision tensor mismatch ({iou_type}, seed {seed})')
    np.testing.assert_allclose(
        acc['recall'], o_acc['recall'], atol=1e-9,
        err_msg=f'recall tensor mismatch ({iou_type}, seed {seed})')
    for i, key in enumerate(PKG_TO_ORACLE):
        assert summary[key] == pytest.approx(o_stats[i], abs=1e-9), \
            f'{key}: pkg {summary[key]} vs pycoco {o_stats[i]}'
    # the fixture must be non-trivial: imperfect but nonzero AP
    if iou_type == 'bbox':
        assert 0.05 < o_stats[0] < 0.95


def test_cocoeval_perfect_and_empty():
    """Degenerate corners: perfect detections -> AP 1.0 under the oracle
    too; no detections -> AP 0 with recall 0 (not -1) where gts exist."""
    images, gt_anns, _ = make_fixture(7, n_imgs=6)
    cat_ids = [1, 2, 3, 4]
    img_ids = [im['id'] for im in images]
    perfect = [dict(image_id=a['image_id'], category_id=a['category_id'],
                    bbox=a['bbox'], score=0.9, mask=a['mask'])
               for a in gt_anns if not a.get('iscrowd')
               and not a.get('ignore')]
    for dts in (perfect, []):
        oracle = OracleCOCOeval(gt_anns, dts, img_ids, cat_ids, 'segm')
        oracle.evaluate_and_accumulate()
        o_stats = oracle.summarize()
        _, summary = _run_package(images, gt_anns, dts, cat_ids, 'segm')
        for i, key in enumerate(PKG_TO_ORACLE):
            assert summary[key] == pytest.approx(o_stats[i], abs=1e-9), key
    assert summary['mAP'] == 0.0
