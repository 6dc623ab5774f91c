"""Golden tests for the panoptic fusion post-processing against a
numpy transcription of the reference loop (reference:
mmdet/models/seg_heads/panoptic_fusion_heads/maskformer_fusion_head.py
panoptic_postprocess :28-93)."""
import numpy as np
import pytest

from boxinstseg_tpu.models.detectors.maskformer import (
    INSTANCE_OFFSET, panoptic_postprocess, semantic_postprocess)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def oracle_panoptic(mask_cls, mask_pred, num_things, num_stuff,
                    object_mask_thr=0.8, iou_thr=0.8,
                    filter_low_score=False):
    """Literal numpy transcription of the reference's sequential loop
    (maskformer_fusion_head.py:47-92), used purely as a test oracle."""
    num_classes = num_things + num_stuff
    probs = _softmax(mask_cls)
    scores, labels = probs.max(-1), probs.argmax(-1)
    mask_pred = 1.0 / (1.0 + np.exp(-mask_pred))

    keep = (labels != num_classes) & (scores > object_mask_thr)
    cur_scores = scores[keep]
    cur_classes = labels[keep]
    cur_masks = mask_pred[keep]
    cur_prob_masks = cur_scores[:, None, None] * cur_masks

    h, w = mask_pred.shape[-2:]
    panoptic_seg = np.full((h, w), num_classes, np.int32)
    if cur_masks.shape[0] == 0:
        return panoptic_seg
    cur_mask_ids = cur_prob_masks.argmax(0)
    instance_id = 1
    for k in range(cur_classes.shape[0]):
        pred_class = int(cur_classes[k])
        isthing = pred_class < num_things
        mask = cur_mask_ids == k
        mask_area = mask.sum()
        original_area = (cur_masks[k] >= 0.5).sum()
        if filter_low_score:
            mask = mask & (cur_masks[k] >= 0.5)
        if mask_area > 0 and original_area > 0:
            if mask_area / original_area < iou_thr:
                continue
            if not isthing:
                panoptic_seg[mask] = pred_class
            else:
                panoptic_seg[mask] = pred_class + instance_id * INSTANCE_OFFSET
                instance_id += 1
    return panoptic_seg


def _fixture(rng, q=8, c_things=3, c_stuff=2, h=16, w=16, scale=4.0):
    """Random (Q, C+1) logits sharp enough that some queries pass the
    0.8 score threshold, plus blobby mask logits."""
    cls = rng.randn(q, c_things + c_stuff + 1).astype(np.float32) * scale
    masks = rng.randn(q, h, w).astype(np.float32) * 2.0
    # a few coherent blobs so areas/IoU paths are exercised
    for k in range(q):
        y0, x0 = rng.randint(0, h - 4), rng.randint(0, w - 4)
        masks[k, y0:y0 + 6, x0:x0 + 6] += 4.0
    return cls, masks


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
@pytest.mark.parametrize('filter_low_score', [False, True])
def test_panoptic_matches_reference_loop(seed, filter_low_score):
    rng = np.random.RandomState(seed)
    cls, masks = _fixture(rng)
    got = np.asarray(panoptic_postprocess(
        cls, masks, num_things_classes=3, num_stuff_classes=2,
        filter_low_score=filter_low_score))
    want = oracle_panoptic(cls, masks, 3, 2,
                           filter_low_score=filter_low_score)
    np.testing.assert_array_equal(got, want)


def test_fixture_exercises_assignment():
    """At least one random fixture must take the non-void path, or the
    parametrized golden above would be vacuous."""
    hit = False
    for seed in range(4):
        cls, masks = _fixture(np.random.RandomState(seed))
        hit |= (oracle_panoptic(cls, masks, 3, 2) != 5).any()
    assert hit


@pytest.mark.parametrize('iou_thr', [0.0, 0.5, 0.95])
def test_panoptic_iou_threshold(iou_thr):
    rng = np.random.RandomState(7)
    cls, masks = _fixture(rng)
    got = np.asarray(panoptic_postprocess(
        cls, masks, num_things_classes=3, num_stuff_classes=2,
        iou_thr=iou_thr))
    want = oracle_panoptic(cls, masks, 3, 2, iou_thr=iou_thr)
    np.testing.assert_array_equal(got, want)


def test_panoptic_nothing_kept_is_void():
    """Flat class logits -> max softmax prob ~1/(C+1) < 0.8 -> all void
    (reference :64-66 'We didn't detect any mask')."""
    q, c, h, w = 4, 5, 8, 8
    cls = np.zeros((q, c + 1), np.float32)
    masks = np.full((q, h, w), 3.0, np.float32)
    got = np.asarray(panoptic_postprocess(cls, masks, 3, 2))
    np.testing.assert_array_equal(got, np.full((h, w), 5, np.int32))


def test_panoptic_instance_ids_increment_in_query_order():
    """Two disjoint confident thing queries -> ids 1 and 2 in query
    order with INSTANCE_OFFSET strides (panoptic_utils.py:5-6)."""
    q, h, w = 2, 8, 8
    cls = np.zeros((q, 4), np.float32)
    cls[:, 0] = 20.0                       # both class 0 (a thing)
    masks = np.full((q, h, w), -10.0, np.float32)
    masks[0, :, :4] = 10.0
    masks[1, :, 4:] = 10.0
    got = np.asarray(panoptic_postprocess(cls, masks,
                                          num_things_classes=2,
                                          num_stuff_classes=1))
    assert set(np.unique(got)) == {0 + 1 * INSTANCE_OFFSET,
                                   0 + 2 * INSTANCE_OFFSET}
    assert (got[:, :4] == 1000).all() and (got[:, 4:] == 2000).all()


def test_stuff_merges_without_instance_id():
    """A confident stuff query labels pixels with the bare class id
    (reference :84-87: stuff shares instance_id 0)."""
    cls = np.zeros((1, 4), np.float32)
    cls[0, 2] = 20.0                       # class 2 = stuff (things=2)
    masks = np.full((1, 8, 8), 10.0, np.float32)
    got = np.asarray(panoptic_postprocess(cls, masks,
                                          num_things_classes=2,
                                          num_stuff_classes=1))
    np.testing.assert_array_equal(got, np.full((8, 8), 2, np.int32))


def test_semantic_postprocess_parity_stub():
    with pytest.raises(NotImplementedError):
        semantic_postprocess(np.zeros((1, 4)), np.zeros((1, 8, 8)))
