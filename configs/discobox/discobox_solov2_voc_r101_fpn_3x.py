# DiscoBox SOLOv2 R-101-FPN 3x Pascal VOC (reference zoo: 34.6 mask AP).
_base_ = './discobox_solov2_voc_r50_fpn_3x.py'

model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(type='Pretrained',
                      checkpoint='torchvision://resnet101')))
work_dir = './work_dirs/discobox_solov2_voc_r101_fpn_3x'
