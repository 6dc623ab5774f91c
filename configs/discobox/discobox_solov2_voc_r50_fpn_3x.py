# DiscoBox SOLOv2 R-50-FPN 3x Pascal VOC (reference zoo: 32.9 mask AP).
_base_ = './discobox_solov2_coco_r50_fpn_3x.py'

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
work_dir = './work_dirs/discobox_solov2_voc_r50_fpn_3x'
