# Box2Mask-T Swin-L (reference zoo: 41.9 val / 42.5 test-dev mask AP).
_base_ = './box2mask_swin-t-p4-w7-224_lsj_8x2_50e_coco.py'
depths = [2, 2, 18, 2]

model = dict(
    backbone=dict(
        pretrain_img_size=384,
        embed_dims=192,
        depths=depths,
        num_heads=[6, 12, 24, 48],
        window_size=12),
    panoptic_head=dict(num_queries=100,
                       in_channels=[192, 384, 768, 1536]))

data = dict(samples_per_gpu=1)
work_dir = './work_dirs/box2mask_swin-l_lsj_8x1_50e_coco'

gt_buckets = (8, 16, 32, 100)
