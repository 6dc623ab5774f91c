# BoxInst R-50-FPN 1x Pascal VOC (reference: boxinst_r50_fpn_1x_voc.py).
_base_ = './boxinst_r50_fpn_3x_voc.py'

# 1x schedule, lr 0.005 for 4 GPUs (reference :147-160)
optimizer = dict(lr=0.005)
lr_config = dict(step=[8, 11])
runner = dict(max_epochs=12)
work_dir = './work_dirs/boxinst_r50_fpn_1x_voc'
