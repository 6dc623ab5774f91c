# Box2Mask-T R-101 50e Pascal VOC (reference zoo: 43.2 mask AP).
_base_ = './box2mask_r50_lsj_8x2_50e_voc.py'

model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(type='Pretrained',
                      checkpoint='torchvision://resnet101')))
work_dir = './work_dirs/box2mask_r101_lsj_8x2_50e_voc'
