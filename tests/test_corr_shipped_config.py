"""The shipped DiscoBox recipe must train WITH the cross-image
correspondence loss: all four discobox configs carry the reference's
``loss_corr`` block (reference
configs/discobox/discobox_solov2_coco_r50_fpn_3x.py:65-93) and
``train_detector`` builds the device-resident ObjectBank from
``obj_bank`` and threads it through the jitted TS train step (reference
ObjectQueues construction, discobox_head.py:729-744).
"""
import copy
import json
import os

import numpy as np
import pytest

import boxinstseg_tpu  # noqa: F401
from boxinstseg_tpu.config import Config

CONFIGS = os.path.join(os.path.dirname(__file__), '..', 'configs')

# the shipped obj_bank min_size=32 is measured in stride-4 grid units
# (reference filters on target-mask extents at mask resolution,
# discobox_head.py:1056-1057, boxes*4 only for image crops :1046), so
# bank-eligible objects must exceed 128 px — use big canvases/objects
H, W = 256, 256
NUM_CLASSES = 3


def test_all_discobox_configs_carry_reference_loss_corr():
    for name in ('discobox_solov2_coco_r50_fpn_3x',
                 'discobox_solov2_coco_r101_fpn_3x',
                 'discobox_solov2_voc_r50_fpn_3x',
                 'discobox_solov2_voc_r101_fpn_3x'):
        cfg = Config.fromfile(
            os.path.join(CONFIGS, 'discobox', name + '.py'))
        lc = cfg.model['bbox_head'].get('loss_corr')
        assert lc, f'{name}: loss_corr missing'
        # reference hyperparameters (discobox_solov2_coco_r50_fpn_3x.py)
        assert lc['corr_exp'] == 1.0 and lc['corr_eps'] == 0.05
        assert lc['corr_num_iter'] == 10
        assert lc['corr_num_smooth_iter'] == 1
        ob = lc['obj_bank']
        assert ob['len_object_queues'] == 100
        assert ob['feat_height'] == 7 and ob['mask_height'] == 28
        assert ob['max_retrieval_objs'] == 5 and ob['min_size'] == 32


def _make_dataset(root, n_images=8, seed=0):
    import cv2
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'images')
    os.makedirs(img_dir, exist_ok=True)
    images, anns = [], []
    aid = 1
    for i in range(n_images):
        img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        for _ in range(rng.randint(1, 3)):
            # > 4*min_size px so the shipped bank-append filter passes
            x1 = int(rng.randint(0, W - 210))
            y1 = int(rng.randint(0, H - 210))
            w = int(rng.randint(150, 210))
            h = int(rng.randint(150, 210))
            cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h),
                          rng.randint(0, 255, 3).tolist(), -1)
            anns.append(dict(id=aid, image_id=i + 1,
                             category_id=(aid % NUM_CLASSES) + 1,
                             bbox=[x1, y1, w, h], area=w * h, iscrowd=0,
                             segmentation=[[x1, y1, x1 + w, y1,
                                            x1 + w, y1 + h, x1, y1 + h]]))
            aid += 1
        cv2.imwrite(os.path.join(img_dir, f'{i}.jpg'), img)
        images.append(dict(id=i + 1, width=W, height=H,
                           file_name=f'{i}.jpg'))
    cats = [dict(id=c + 1, name=f'cls{c}') for c in range(NUM_CLASSES)]
    ann_file = os.path.join(root, 'ann.json')
    with open(ann_file, 'w') as f:
        json.dump(dict(images=images, annotations=anns,
                       categories=cats), f)
    return ann_file, img_dir


def test_train_detector_builds_and_feeds_object_bank(tmp_path):
    """End-to-end through train_detector with the SHIPPED loss_corr block
    (every hyperparameter verbatim, incl. len_object_queues=100): the
    bank must exist in the returned TrainState and must have received
    appends from the jitted TS step."""
    from boxinstseg_tpu.registry import build_dataset, build_detector
    from boxinstseg_tpu.apis.train import train_detector
    from test_discobox_model import tiny_cfg

    shipped = Config.fromfile(os.path.join(
        CONFIGS, 'discobox', 'discobox_solov2_coco_r50_fpn_3x.py'))
    lc = copy.deepcopy(dict(shipped.model['bbox_head']['loss_corr']))

    mcfg = tiny_cfg()
    mcfg['bbox_head']['num_classes'] = NUM_CLASSES
    mcfg['bbox_head']['loss_corr'] = lc
    mcfg['bbox_head']['max_corr_queries'] = 4

    ann_file, img_dir = _make_dataset(str(tmp_path))
    img_norm = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True, with_mask=False),
        dict(type='GenerateBoxMask'),
        dict(type='Resize', img_scale=(W, H), keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize', **img_norm),
        dict(type='Pad', size_divisor=32),
        dict(type='Collect',
             keys=['img', 'gt_bboxes', 'gt_labels', 'gt_masks']),
    ]
    classes = tuple(f'cls{c}' for c in range(NUM_CLASSES))
    cfg = Config.fromdict(dict(
        model=mcfg,
        data=dict(samples_per_gpu=1, workers_per_gpu=1,
                  train=dict(type='CocoDataset', ann_file=ann_file,
                             img_prefix=img_dir, pipeline=pipeline,
                             classes=classes)),
        with_gt_masks=True,
        optimizer=dict(type='SGD', lr=0.001, momentum=0.9,
                       weight_decay=1e-4),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(policy='step', warmup='linear', warmup_iters=2,
                       warmup_ratio=0.1, step=[100]),
        runner=dict(type='IterBasedRunner', max_iters=2),
        checkpoint_config=dict(interval=100),
        log_config=dict(interval=1),
        # open the ts/corr gates immediately (the production thresholds
        # need avg_loss_ins to fall below 0.3/0.2 first)
        ts_cfg=dict(momentum=0.99, start_iter=1, ts_thresh=10.0,
                    corr_thresh=10.0),
        canvases=[(H, W)], max_gts=2, seed=0,
        work_dir=str(tmp_path / 'work'),
    ))

    model = build_detector(cfg.model.copy())
    dataset = build_dataset(cfg.data['train'])
    state = train_detector(model, dataset, cfg)

    bank = state.corr_state
    assert bank is not None, 'train_detector did not build the ObjectBank'
    assert bank.feat.shape == (NUM_CLASSES, 100, 7, 7, 32), \
        'bank dims must come from the shipped obj_bank block'
    assert bank.mask.shape == (NUM_CLASSES, 100, 28, 28)
    assert int(np.asarray(bank.count).sum()) > 0, \
        'TS step never appended to the bank'
    assert int(state.step) == 2
