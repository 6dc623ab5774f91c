"""Learning test (accuracy-parity gate, part 3): tiny BoxInst trained
from scratch on painted rectangles must actually LEARN instance masks —
COCO-protocol mask AP over a nontrivial threshold — exercising the full
config -> data -> FCOS assignment -> BoxInst projection/pairwise losses
-> SGD -> predict -> RLE -> COCOeval chain end to end. Every other test
asserts mechanics or golden math; this one asserts optimization works.

Calibration on this harness (8-device CPU mesh, seed 0): 150 iters of
global-batch-8 SGD reach segm mAP 0.606 / mAP50 0.797 / bbox mAP50 1.0;
the asserted thresholds leave ~2x margin.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import boxinstseg_tpu  # noqa: F401
from boxinstseg_tpu.config import Config

H, W = 96, 128
NUM_CLASSES = 3
# class identity is carried by the fill color so classification is
# learnable (red/green/blue-ish rectangles on noise background)
COLORS = [(210, 40, 40), (40, 210, 40), (40, 40, 210)]


def make_dataset(root, n_images=8, seed=0, overlap=True):
    """Painted-rectangles COCO set. ``overlap=False`` rejection-samples
    boxes so no two overlap: later paint overwrites earlier pixels, so
    an occluded object's visible region contradicts its box-shaped
    Chan-Vese homogeneity target — BoxLevelset's gate uses fully
    visible objects (the level-set energy's own operating assumption);
    the other families keep the harder overlapping layout."""
    import cv2
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'images')
    os.makedirs(img_dir, exist_ok=True)
    images, anns = [], []
    aid = 1
    for i in range(n_images):
        img = rng.randint(0, 160, (H, W, 3)).astype(np.uint8)
        placed = []
        for _ in range(rng.randint(1, 4)):
            for _try in range(20):
                x1 = int(rng.randint(0, W - 48))
                y1 = int(rng.randint(0, H - 48))
                w = int(rng.randint(24, 48))
                h = int(rng.randint(24, 48))
                if overlap or all(
                        x1 + w <= px or px + pw <= x1
                        or y1 + h <= py or py + ph <= y1
                        for (px, py, pw, ph) in placed):
                    break
            else:
                continue
            placed.append((x1, y1, w, h))
            cls = int(rng.randint(0, NUM_CLASSES))
            base = np.array(COLORS[cls])
            jit = rng.randint(-20, 20, 3)
            cv2.rectangle(img, (x1, y1), (x1 + w - 1, y1 + h - 1),
                          np.clip(base + jit, 0, 255).tolist(), -1)
            anns.append(dict(id=aid, image_id=i + 1, category_id=cls + 1,
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


def test_boxinst_learns_masks_from_boxes(tmp_path):
    from boxinstseg_tpu.registry import build_dataset, build_detector
    from boxinstseg_tpu.apis.train import train_detector
    from boxinstseg_tpu.apis.test import run_evaluation
    from test_boxinst_model import tiny_boxinst_cfg

    ann_file, img_dir = make_dataset(str(tmp_path))
    img_norm = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True, with_mask=False),
        dict(type='Resize', img_scale=(W, H), keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize', **img_norm),
        dict(type='Pad', size_divisor=32),
        dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
    ]
    test_pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='MultiScaleFlipAug', img_scale=(W, H), flip=False,
             transforms=[
                 dict(type='Resize', keep_ratio=True),
                 dict(type='RandomFlip'),
                 dict(type='Normalize', **img_norm),
                 dict(type='Pad', size_divisor=32),
                 dict(type='Collect', keys=['img']),
             ])]
    classes = tuple(f'cls{c}' for c in range(NUM_CLASSES))
    mcfg = tiny_boxinst_cfg()
    mcfg['bbox_head']['num_classes'] = NUM_CLASSES
    mcfg['mask_head']['pairwise_warmup'] = 40
    mcfg['test_cfg']['score_thr'] = 0.1
    cfg = Config.fromdict(dict(
        model=mcfg,
        data=dict(samples_per_gpu=1, workers_per_gpu=1,
                  train=dict(type='CocoDataset', ann_file=ann_file,
                             img_prefix=img_dir, pipeline=pipeline,
                             classes=classes),
                  test=dict(type='CocoDataset', ann_file=ann_file,
                            img_prefix=img_dir, pipeline=test_pipeline,
                            classes=classes)),
        optimizer=dict(type='SGD', lr=0.01, momentum=0.9,
                       weight_decay=1e-4),
        optimizer_config=dict(grad_clip=dict(max_norm=10)),
        lr_config=dict(policy='step', warmup='linear', warmup_iters=20,
                       warmup_ratio=0.1, step=[10000]),
        runner=dict(type='IterBasedRunner', max_iters=150),
        checkpoint_config=dict(interval=10000),
        log_config=dict(interval=50),
        canvases=[(H, W)], max_gts=8, seed=0,
        work_dir=str(tmp_path / 'work'),
    ))
    model = build_detector(cfg.model.copy())
    dataset = build_dataset(cfg.data['train'])
    state = train_detector(model, dataset, cfg)

    test_ds = build_dataset({**cfg.data['test'], 'test_mode': True})
    metrics = run_evaluation(model, state.variables(), test_ds, cfg,
                             metrics=['bbox', 'segm'], batch_size=2)
    assert metrics['bbox_mAP_50'] >= 0.7, metrics
    assert metrics['segm_mAP_50'] >= 0.5, metrics
    assert metrics['segm_mAP'] >= 0.3, metrics
