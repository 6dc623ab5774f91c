"""inference_detector must work for ALL four method families (reference:
mmdet/apis/inference.py:93-156 is model-agnostic; the eval loop already
handles SOLO-style outputs — apis/test.py format_detection)."""
import numpy as np
import pytest

import boxinstseg_tpu  # noqa: F401
from boxinstseg_tpu.config import Config

H, W = 96, 96


def _cfg_for(model_cfg):
    img_norm = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
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
    return Config.fromdict(dict(model=model_cfg,
                                test_pipeline=test_pipeline,
                                canvases=[(H, W)]))


def _run(model_cfg):
    from boxinstseg_tpu.apis.inference import (inference_detector,
                                               init_detector)
    cfg = _cfg_for(model_cfg)
    model, variables, cfg = init_detector(cfg)
    img = (np.random.RandomState(0).rand(H, W, 3) * 255).astype(np.uint8)
    det = inference_detector(model, variables, cfg, img)
    assert det['bboxes'].ndim == 2 and det['bboxes'].shape[1] == 5
    assert len(det['labels']) == len(det['bboxes']) == len(det['masks'])
    for m in det['masks']:
        assert m.shape == (H, W) and m.dtype == np.uint8
    return det


def test_inference_boxinst():
    from test_boxinst_model import tiny_boxinst_cfg
    _run(tiny_boxinst_cfg())


def test_inference_boxlevelset():
    from test_boxlevelset_model import tiny_cfg
    _run(tiny_cfg())


def test_inference_discobox():
    from test_discobox_model import tiny_cfg
    _run(tiny_cfg())


def test_inference_box2mask():
    from test_box2mask_model import tiny_cfg
    _run(tiny_cfg())
