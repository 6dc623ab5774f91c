# BoxInst R-101-FPN 3x Pascal VOC (reference zoo: 34.2 mask AP).
_base_ = './boxinst_r50_fpn_3x_voc.py'

model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(type='Pretrained',
                      checkpoint='torchvision://resnet101')))
work_dir = './work_dirs/boxinst_r101_fpn_3x_voc'
