# BoxLevelset R-50-FPN 1x Pascal VOC at 640 scale
# (reference: box_levelset_voc_r50_fpn_1x_640.py — finer SOLO grids /
# wider scale ranges, 1333x640 resize, AdamW 5e-5, 1x schedule).
_base_ = './box_levelset_voc_r50_fpn_3x.py'

model = dict(
    bbox_head=dict(
        scale_ranges=((1, 96), (48, 192), (96, 384), (192, 768),
                      (384, 2048)),
        num_grids=[40, 36, 24, 16, 12]))

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=False),
    dict(type='GenerateBoxMask'),
    dict(type='Resize', img_scale=(1333, 640), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels',
                               'gt_masks']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(
        type='MultiScaleFlipAug',
        img_scale=(1333, 640),
        flip=False,
        transforms=[
            dict(type='Resize', keep_ratio=True),
            dict(type='RandomFlip'),
            dict(type='Normalize', **img_norm_cfg),
            dict(type='Pad', size_divisor=32),
            dict(type='ImageToTensor', keys=['img']),
            dict(type='Collect', keys=['img']),
        ])
]
data = dict(
    train=dict(pipeline=train_pipeline),
    val=dict(pipeline=test_pipeline),
    test=dict(pipeline=test_pipeline))
canvases = [(640, 1344), (1344, 640)]

optimizer = dict(_delete_=True, type='AdamW', lr=0.00005,
                 weight_decay=0.0001)
lr_config = dict(step=[9, 11])
runner = dict(max_epochs=12)
work_dir = './work_dirs/box_levelset_voc_r50_fpn_1x_640'
