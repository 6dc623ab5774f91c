# BoxInst R-101-FPN, 1x schedule.
_base_ = './boxinst_r50_fpn_1x_coco.py'

model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(type='Pretrained',
                      checkpoint='torchvision://resnet101')))
work_dir = './work_dirs/boxinst_r101_fpn_1x_coco'
