# Box2Mask-T R-50 50e Pascal VOC (reference zoo: 41.4 mask AP;
# reference: box2mask_r50_lsj_8x2_50e_voc.py — 20 thing classes,
# 33065 iters with decay at [29390, 31840], eval/ckpt every 2000 iters).
_base_ = './box2mask_r50_lsj_8x2_50e_coco.py'

num_things_classes = 20
num_classes = num_things_classes

model = dict(
    panoptic_head=dict(
        num_things_classes=num_things_classes,
        loss_cls=dict(class_weight=[1.0] * num_classes + [0.1])),
    panoptic_fusion_head=dict(num_things_classes=num_things_classes))

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

lr_config = dict(step=[29390, 31840])
max_iters = 33065
runner = dict(max_iters=max_iters)
checkpoint_config = dict(interval=2000)
evaluation = dict(interval=2000)
work_dir = './work_dirs/box2mask_r50_lsj_8x2_50e_voc'
