fp16 = dict(loss_scale=512.)  # reference :1 — bf16 on TPU, no scaling
# DiscoBox SOLOv2 R-50-FPN 3x COCO (reference zoo: 32.2 val mask AP).
_base_ = [
    '../_base_/default_runtime.py',
    '../_base_/datasets/coco_instance.py',
]

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    to_rgb=True)

model = dict(
    type='DiscoBoxSOLOv2',
    backbone=dict(
        type='ResNet', depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
        frozen_stages=1, style='pytorch',
        init_cfg=dict(type='Pretrained',
                      checkpoint='torchvision://resnet50')),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, num_outs=5),
    bbox_head=dict(
        type='DiscoBoxSOLOv2Head',
        num_classes=80,
        in_channels=256,
        stacked_convs=4,
        seg_feat_channels=512,
        strides=[8, 8, 16, 32, 32],
        scale_ranges=((1, 96), (48, 192), (96, 384), (192, 768),
                      (384, 2048)),
        sigma=0.2,
        num_grids=[40, 36, 24, 16, 12],
        ins_out_channels=256,
        loss_ins=dict(type='DiceLoss', use_sigmoid=True, loss_weight=1.0),
        loss_ts=dict(
            type='DiceLoss', momentum=0.999, use_ind_teacher=True,
            loss_weight=1.0, kernel=3, max_iter=10, alpha0=2.0,
            theta0=0.5, theta1=30.0, theta2=20.0, base=0.10,
            crf_height=28, crf_width=28),
        loss_cate=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                       alpha=0.25, loss_weight=1.0),
        # cross-image semantic correspondence (reference
        # configs/discobox/discobox_solov2_coco_r50_fpn_3x.py:65-93);
        # train_detector builds the device-resident ObjectBank from
        # obj_bank and threads it through the TS train step
        loss_corr=dict(
            type='InfoNCE',
            loss_weight=1.0,
            corr_exp=1.0,
            corr_eps=0.05,
            gaussian_filter_size=3,
            low_score=0.3,
            corr_num_iter=10,
            corr_num_smooth_iter=1,
            save_corr_img=False,
            dist_kernel=9,
            obj_bank=dict(
                img_norm_cfg=img_norm_cfg,
                len_object_queues=100,
                fg_iou_thresh=0.7,
                bg_iou_thresh=0.7,
                ratio_range=[0.9, 1.2],
                appear_thresh=0.7,
                min_retrieval_objs=2,
                max_retrieval_objs=5,
                feat_height=7,
                feat_width=7,
                mask_height=28,
                mask_width=28,
                img_height=200,
                img_width=200,
                min_size=32,
                num_gpu_bank=20)),
        max_pos=128),
    mask_feat_head=dict(
        type='DiscoBoxMaskFeatHead', in_channels=256, out_channels=128,
        start_level=0, end_level=3, num_classes=256,
        norm_cfg=dict(type='GN', num_groups=32)),
    train_cfg=dict(),
    test_cfg=dict(
        nms_pre=500, score_thr=0.1, mask_thr=0.4, filter_thr=0.05,
        kernel='gaussian', sigma=2.0, max_per_img=100))

# teacher-student schedule knobs (engine: make_ts_train_step)
ts_cfg = dict(momentum=0.999, start_iter=13000, ts_thresh=0.3)

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
with_gt_masks = True

optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(
    policy='step', warmup='linear', warmup_iters=500, warmup_ratio=0.01,
    step=[27, 33])
runner = dict(type='EpochBasedRunner', max_epochs=36)
evaluation = dict(interval=1, metric=['segm'])
work_dir = './work_dirs/discobox_solov2_coco_r50_fpn_3x'

# GT-capacity buckets: pad each batch to the smallest bucket >=
# its live max (COCO mean ~7 instances); per-GT target/loss terms
# stop paying for the full max_gts capacity (data/batcher.py)
gt_buckets = (8, 16, 32, 100)
