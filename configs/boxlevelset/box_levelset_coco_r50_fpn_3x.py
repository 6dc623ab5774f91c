# BoxLevelset R-50-FPN 3x COCO (reference: configs/boxlevelset/).
_base_ = [
    '../_base_/default_runtime.py',
    '../_base_/datasets/coco_instance.py',
]

model = dict(
    type='BoxLevelSet',
    backbone=dict(
        type='ResNet', depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
        frozen_stages=1, style='pytorch',
        init_cfg=dict(type='Pretrained',
                      checkpoint='torchvision://resnet50')),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, num_outs=5),
    bbox_head=dict(
        type='BoxSOLOv2Head',
        num_classes=80,
        in_channels=256,
        stacked_convs=4,
        seg_feat_channels=256,
        strides=[8, 8, 16, 32, 32],
        scale_ranges=((1, 96), (48, 192), (96, 384), (192, 768),
                      (384, 2048)),
        sigma=0.2,
        num_grids=[40, 36, 24, 16, 12],
        cate_down_pos=0,
        loss_cate=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_boxpro=dict(type='BoxProjectionLoss', loss_weight=3.0),
        loss_levelset=dict(type='LevelsetLoss', loss_weight=1.0),
        max_pos=196,
        tf_size=(96, 96),
        tf_max_depth=0),
    train_cfg=dict(),
    test_cfg=dict(
        nms_pre=500,
        score_thr=0.05,
        mask_thr=0.55,
        filter_thr=0.025,
        kernel='gaussian',
        sigma=2.0,
        max_per_img=100))

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=False),
    dict(type='GenerateBoxMask'),
    dict(type='Resize',
         img_scale=[(1333, 800), (1333, 768), (1333, 736),
                    (1333, 704), (1333, 672), (1333, 640)],
         multiscale_mode='value',
         keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels', 'gt_masks']),
]
data = dict(train=dict(pipeline=train_pipeline))
# box bitmasks are needed at stride 4 for targets
with_gt_masks = True

optimizer = dict(
    type='AdamW', lr=0.0001, weight_decay=0.1,
    paramwise_cfg=dict(norm_decay_mult=0.0, bypass_duplicate=True))
optimizer_config = dict(grad_clip=dict(max_norm=1, norm_type=2))
lr_config = dict(
    policy='step', warmup='linear', warmup_iters=2000, warmup_ratio=0.01,
    step=[27, 33])
runner = dict(type='EpochBasedRunner', max_epochs=36)
checkpoint_config = dict(interval=2)
evaluation = dict(interval=1, metric=['segm'])
work_dir = './work_dirs/box_levelset_coco_r50_fpn_3x'

# GT-capacity buckets: pad each batch to the smallest bucket >=
# its live max (COCO mean ~7 instances); per-GT target/loss terms
# stop paying for the full max_gts capacity (data/batcher.py)
gt_buckets = (8, 16, 32, 100)
