# BoxInst R-101-FPN, 3x schedule (33.1 val mask AP in the reference zoo).
_base_ = './boxinst_r101_fpn_1x_coco.py'

lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
work_dir = './work_dirs/boxinst_r101_fpn_3x_coco'
