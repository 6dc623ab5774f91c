import json

import numpy as np
import pytest

from boxinstseg_tpu.data.coco_api import (COCO, ann_to_mask, bbox_iou_xywh,
                                          mask_iou, poly_to_mask, rle_decode,
                                          rle_encode)
from boxinstseg_tpu.core.eval.coco_eval import evaluate_coco


def make_gt(num_imgs=4):
    images = [dict(id=i + 1, width=100, height=80,
                   file_name=f'{i}.jpg') for i in range(num_imgs)]
    cats = [dict(id=7, name='cat'), dict(id=9, name='dog')]
    anns = []
    aid = 1
    for i in range(num_imgs):
        for (x, y, w, h, c) in [(10, 10, 20, 20, 7), (50, 30, 30, 25, 9)]:
            anns.append(dict(
                id=aid, image_id=i + 1, category_id=c,
                bbox=[x, y, w, h], area=w * h, iscrowd=0,
                segmentation=[[x, y, x + w, y, x + w, y + h, x, y + h]]))
            aid += 1
    return COCO(dataset=dict(images=images, annotations=anns,
                             categories=cats))


def test_rle_roundtrip(rng):
    m = (rng.rand(37, 53) > 0.6).astype(np.uint8)
    rle = rle_encode(m)
    back = rle_decode(rle)
    np.testing.assert_array_equal(back, m)


def test_perfect_detections_ap1():
    coco = make_gt()
    img_ids = coco.get_img_ids()
    cat_ids = coco.get_cat_ids()
    results = []
    for _ in img_ids:
        boxes = np.array([[10, 10, 30, 30, 0.9], [50, 30, 80, 55, 0.8]],
                         np.float64)
        labels = np.array([0, 1])
        masks = []
        for b in boxes:
            m = np.zeros((80, 100), np.uint8)
            # polygon rasterization is boundary-inclusive -> +1
            m[int(b[1]):int(b[3]) + 1, int(b[0]):int(b[2]) + 1] = 1
            masks.append(rle_encode(m))
        results.append(dict(bboxes=boxes, labels=labels, masks=masks))
    out = evaluate_coco(coco, img_ids, cat_ids, results, ['bbox', 'segm'])
    assert out['bbox_mAP'] == pytest.approx(1.0)
    assert out['segm_mAP'] == pytest.approx(1.0, abs=0.02)


def test_missed_and_false_positive_lower_ap():
    coco = make_gt()
    img_ids = coco.get_img_ids()
    cat_ids = coco.get_cat_ids()
    results = []
    for i in img_ids:
        # detect only the first object, plus one false positive
        boxes = np.array([[10, 10, 30, 30, 0.9], [0, 0, 9, 9, 0.85]],
                         np.float64)
        labels = np.array([0, 0])
        results.append(dict(bboxes=boxes, labels=labels))
    out = evaluate_coco(coco, img_ids, cat_ids, results, ['bbox'])
    # class 0: AP hit by FP at high score? FP score below TP -> precision
    # stays 1 up to recall 1 for class 'cat'; class 'dog' has zero dets.
    assert 0.4 < out['bbox_mAP'] < 0.6


def test_localization_quality_affects_high_iou():
    coco = make_gt()
    img_ids = coco.get_img_ids()
    cat_ids = coco.get_cat_ids()
    results = []
    for i in img_ids:
        # small offsets: IoU in (0.5, 0.75) -> matches at 0.5 not at 0.75
        boxes = np.array([[12, 12, 32, 32, 0.9], [53, 33, 83, 58, 0.8]],
                         np.float64)
        labels = np.array([0, 1])
        results.append(dict(bboxes=boxes, labels=labels))
    out = evaluate_coco(coco, img_ids, cat_ids, results, ['bbox'])
    assert out['bbox_mAP_50'] == pytest.approx(1.0)
    assert out['bbox_mAP_75'] == pytest.approx(0.0)


def test_crowd_gt_not_counted():
    coco = make_gt(1)
    # mark the dog ann as crowd
    for a in coco.anns.values():
        if a['category_id'] == 9:
            a['iscrowd'] = 1
    coco._index()
    img_ids = coco.get_img_ids()
    results = [dict(bboxes=np.array([[10, 10, 30, 30, 0.9]]),
                    labels=np.array([0]))]
    out = evaluate_coco(coco, img_ids, coco.get_cat_ids(), results, ['bbox'])
    assert out['bbox_mAP'] == pytest.approx(1.0)  # dog cat has no real GT


def test_poly_to_mask_area():
    m = poly_to_mask([[10, 10, 30, 10, 30, 30, 10, 30]], 40, 40)
    assert 19 * 19 <= m.sum() <= 21 * 21
