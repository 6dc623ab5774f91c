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

# Swin AdamW recipe (reference: configs/box2mask/box2mask_swin-t...py
# optimizer block — backbone at 0.1x lr, every backbone norm and the
# position-embedding tables at 0.1x lr with weight decay 0)
backbone_norm_multi = dict(lr_mult=0.1, decay_mult=0.0)
backbone_embed_multi = dict(lr_mult=0.1, decay_mult=0.0)
embed_multi = dict(lr_mult=1.0, decay_mult=0.0)
custom_keys = {
    'backbone': dict(lr_mult=0.1, decay_mult=1.0),
    'backbone.patch_embed.norm': backbone_norm_multi,
    'backbone.norm': backbone_norm_multi,
    'absolute_pos_embed': backbone_embed_multi,
    'relative_position_bias_table': backbone_embed_multi,
    'query_embed': embed_multi,
    'query_feat': embed_multi,
    'level_embed': embed_multi,
}
custom_keys.update({
    f'backbone.stages.{stage_id}.blocks.{block_id}.norm':
        backbone_norm_multi
    for stage_id, num_blocks in enumerate(depths)
    for block_id in range(num_blocks)
})
custom_keys.update({
    f'backbone.stages.{stage_id}.downsample.norm': backbone_norm_multi
    for stage_id in range(len(depths) - 1)
})
optimizer = dict(
    _delete_=True,
    type='AdamW',
    lr=0.0002,
    weight_decay=0.05,
    eps=1e-8,
    betas=(0.9, 0.999),
    paramwise_cfg=dict(custom_keys=custom_keys, norm_decay_mult=0.0))
lr_config = dict(
    policy='step',
    gamma=0.1,
    by_epoch=False,
    step=[163890, 177546],
    warmup='linear',
    warmup_ratio=1.0,
    warmup_iters=10)
max_iters = 184376
runner = dict(type='IterBasedRunner', max_iters=max_iters)
# reference sets samples_per_gpu=4 for swin-t (its data block uses
# _delete_=True and drops the dataset defs — kept here instead)
data = dict(samples_per_gpu=4, workers_per_gpu=4)
work_dir = './work_dirs/box2mask_swin-t_lsj_8x2_50e_coco'
