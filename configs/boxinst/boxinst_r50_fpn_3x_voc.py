# BoxInst R-50-FPN on Pascal VOC (reference zoo: 32.0 mask AP).
_base_ = './boxinst_r50_fpn_1x_coco.py'

model = dict(bbox_head=dict(num_classes=20))

dataset_type = 'PascalVOCDataset'
data_root = '/data/voc/'
data = dict(
    train=dict(
        type=dataset_type,
        ann_file=data_root + 'annotations/voc_2012_train_aug_cocostyle.json',
        img_prefix=data_root + 'images/'),
    val=dict(
        type=dataset_type,
        ann_file=data_root + 'annotations/voc_2012_val_cocostyle.json',
        img_prefix=data_root + 'images/'),
    test=dict(
        type=dataset_type,
        ann_file=data_root + 'annotations/voc_2012_val_cocostyle.json',
        img_prefix=data_root + 'images/'))

lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
work_dir = './work_dirs/boxinst_r50_fpn_3x_voc'
