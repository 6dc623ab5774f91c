# BoxLevelset R-101-FPN 3x Pascal VOC.
_base_ = './box_levelset_voc_r50_fpn_3x.py'

model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(type='Pretrained',
                      checkpoint='torchvision://resnet101')))
work_dir = './work_dirs/box_levelset_voc_r101_fpn_3x'
