"""End-to-end integration: synthetic COCO dataset on disk -> config ->
train_detector (pjit loop, checkpointing) -> run_evaluation (COCOeval)."""
import json
import os

import numpy as np
import pytest


pytestmark = pytest.mark.slow
H, W = 128, 160
NUM_CLASSES = 4


def make_dataset(root, n_images=8, seed=0):
    import cv2
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'images')
    os.makedirs(img_dir, exist_ok=True)
    images, anns = [], []
    aid = 1
    for i in range(n_images):
        img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        boxes = []
        for _ in range(rng.randint(1, 4)):
            x1 = int(rng.randint(0, W - 48))
            y1 = int(rng.randint(0, H - 48))
            w = int(rng.randint(24, 48))
            h = int(rng.randint(24, 48))
            # paint the object so there is some signal
            color = rng.randint(0, 255, 3).tolist()
            cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), color, -1)
            boxes.append((x1, y1, w, h))
        cv2.imwrite(os.path.join(img_dir, f'{i}.jpg'), img)
        images.append(dict(id=i + 1, width=W, height=H,
                           file_name=f'{i}.jpg'))
        for (x1, y1, w, h) in boxes:
            anns.append(dict(id=aid, image_id=i + 1,
                             category_id=(aid % NUM_CLASSES) + 1,
                             bbox=[x1, y1, w, h], area=w * h, iscrowd=0,
                             segmentation=[[x1, y1, x1 + w, y1,
                                            x1 + w, y1 + h, x1, y1 + h]]))
            aid += 1
    cats = [dict(id=c + 1, name=f'cls{c}') for c in range(NUM_CLASSES)]
    ann_file = os.path.join(root, 'ann.json')
    with open(ann_file, 'w') as f:
        json.dump(dict(images=images, annotations=anns,
                       categories=cats), f)
    return ann_file, img_dir


def test_train_and_eval_end_to_end(tmp_path):
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.config import Config
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
    cfg = Config.fromdict(dict(
        model=tiny_boxinst_cfg(),
        data=dict(samples_per_gpu=1, workers_per_gpu=1,
                  train=dict(type='CocoDataset', ann_file=ann_file,
                             img_prefix=img_dir, pipeline=pipeline,
                             classes=classes),
                  test=dict(type='CocoDataset', ann_file=ann_file,
                            img_prefix=img_dir, pipeline=test_pipeline,
                            classes=classes)),
        optimizer=dict(type='SGD', lr=0.002, momentum=0.9,
                       weight_decay=1e-4),
        optimizer_config=dict(grad_clip=dict(max_norm=10)),
        lr_config=dict(policy='step', warmup='linear', warmup_iters=2,
                       warmup_ratio=0.1, step=[100]),
        runner=dict(type='EpochBasedRunner', max_epochs=2),
        checkpoint_config=dict(interval=2),
        log_config=dict(interval=1),
        canvases=[(H, W)],
        max_gts=8,
        seed=0,
        work_dir=str(tmp_path / 'work'),
    ))

    model = build_detector(cfg.model.copy())
    dataset = build_dataset(cfg.data['train'])
    assert len(dataset) == 8
    state = train_detector(model, dataset, cfg)
    assert int(state.step) == 2          # 8 imgs / global batch 8 x 2 epochs
    assert os.path.isdir(os.path.join(cfg.work_dir, 'checkpoints'))

    # resume must pick up from the checkpoint
    state2 = train_detector(model, dataset, cfg.copy(), resume_from=None,
                            init_params=None)
    # fresh run (no auto_resume) -> starts at 0 again; now with auto_resume
    cfg.auto_resume = True
    cfg.runner = dict(type='EpochBasedRunner', max_epochs=3)
    state3 = train_detector(model, dataset, cfg)
    assert int(state3.step) == 3

    # evaluation end to end (jitted predict + host masks + COCOeval)
    test_ds = build_dataset({**cfg.data['test'], 'test_mode': True})
    metrics = run_evaluation(model, state.variables(), test_ds, cfg,
                             metrics=['bbox', 'segm'], batch_size=2)
    assert 'bbox_mAP' in metrics and 'segm_mAP' in metrics
    assert np.isfinite(metrics['bbox_mAP'])
