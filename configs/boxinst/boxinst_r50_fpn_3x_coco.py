# BoxInst R-50-FPN, 3x schedule (32.1 val mask AP in the reference zoo).
_base_ = './boxinst_r50_fpn_1x_coco.py'

lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
work_dir = './work_dirs/boxinst_r50_fpn_3x_coco'
