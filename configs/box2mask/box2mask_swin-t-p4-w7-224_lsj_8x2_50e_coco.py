# Box2Mask-T Swin-T, LSJ 50e COCO.
_base_ = './box2mask_r50_lsj_8x2_50e_coco.py'
depths = [2, 2, 6, 2]

model = dict(
    backbone=dict(
        _delete_=True,
        type='SwinTransformer',
        embed_dims=96,
        depths=depths,
        num_heads=[3, 6, 12, 24],
        window_size=7,
        mlp_ratio=4,
        qkv_bias=True,
        drop_path_rate=0.3,
        patch_norm=True,
        out_indices=(0, 1, 2, 3),
        frozen_stages=-1),
    panoptic_head=dict(in_channels=[96, 192, 384, 768]))
work_dir = './work_dirs/box2mask_swin-t_lsj_8x2_50e_coco'
