"""by_epoch semantics: LR schedule / checkpoint / eval intervals must honor
mmcv's by_epoch flags (reference: mmcv LrUpdaterHook + CheckpointHook;
mmdet/apis/train.py:226-227 derives evaluation by_epoch from runner type).

The Box2Mask recipe (configs/box2mask/box2mask_r50_lsj_8x2_50e_coco.py,
mirroring reference :209-235) is iter-based: step=[327778, 355092] are
absolute iterations, checkpoint interval=5000 iterations.
"""
import os

import numpy as np


def _load(cfg_name):
    from boxinstseg_tpu.config import Config
    root = os.path.join(os.path.dirname(__file__), '..', 'configs')
    return Config.fromfile(os.path.join(root, cfg_name))


def test_box2mask_iter_based_lr_and_intervals():
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.apis.train import resolve_intervals
    from boxinstseg_tpu.engine import build_lr_schedule

    cfg = _load('box2mask/box2mask_r50_lsj_8x2_50e_coco.py')
    iters_per_epoch = 7393  # 118287 COCO train imgs / batch 16
    iv = resolve_intervals(cfg, iters_per_epoch)
    assert iv['max_iters'] == 368750
    assert iv['lr_by_epoch'] is False
    assert iv['ckpt_interval_iters'] == 5000     # NOT x iters_per_epoch
    assert iv['eval_interval_iters'] == 5000     # IterBasedRunner -> iters

    base_lr = cfg.optimizer['lr']
    sched = build_lr_schedule(cfg.lr_config, base_lr, iters_per_epoch,
                              by_epoch=iv['lr_by_epoch'],
                              max_iters=iv['max_iters'])
    # steps are absolute iterations: decay fires inside the run
    assert np.isclose(float(sched(327_777)), base_lr)
    assert np.isclose(float(sched(327_778)), base_lr * 0.1)
    assert np.isclose(float(sched(355_092)), base_lr * 0.01)
    assert np.isclose(float(sched(368_749)), base_lr * 0.01)


def test_boxinst_epoch_based_lr_and_intervals():
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.apis.train import resolve_intervals
    from boxinstseg_tpu.engine import build_lr_schedule

    cfg = _load('boxinst/boxinst_r50_fpn_1x_coco.py')
    ipe = 1000
    iv = resolve_intervals(cfg, ipe)
    assert iv['max_iters'] == 12 * ipe
    assert iv['lr_by_epoch'] is True
    assert iv['ckpt_interval_iters'] == cfg.checkpoint_config['interval'] * ipe
    assert iv['eval_interval_iters'] == cfg.evaluation.get('interval', 1) * ipe

    base_lr = cfg.optimizer['lr']
    sched = build_lr_schedule(cfg.lr_config, base_lr, ipe,
                              by_epoch=iv['lr_by_epoch'],
                              max_iters=iv['max_iters'])
    # schedule_1x: step=[8, 11] epochs
    assert np.isclose(float(sched(8 * ipe - 1)), base_lr)
    assert np.isclose(float(sched(8 * ipe)), base_lr * 0.1)
    assert np.isclose(float(sched(11 * ipe)), base_lr * 0.01)


def test_eval_hook_dynamic_intervals():
    from boxinstseg_tpu.engine.hooks import EvalHook

    class _NoEval(EvalHook):
        def __init__(self, interval, dynamic):
            self.interval = interval
            self.dynamic = sorted(dynamic)
            self.fired = []

        def after_step(self, i, state, logs):
            if (i + 1) % self._interval_at(i):
                return
            self.fired.append(i + 1)

    # reference box2mask: dynamic_intervals=[(365001, 368750)] — after iter
    # 365001 only eval at max_iters
    h = _NoEval(5000, [(365001, 368750)])
    for i in range(359_999, 368_750):
        h.after_step(i, None, None)
    assert h.fired == [360_000, 365_000, 368_750]


def test_iter_based_runner_integration(tmp_path):
    """IterBasedRunner end-to-end: checkpoints land at iter (not epoch)
    boundaries and by_epoch=False LR steps fire."""
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.config import Config
    from boxinstseg_tpu.registry import build_dataset, build_detector
    from boxinstseg_tpu.apis.train import train_detector
    from test_boxinst_model import tiny_boxinst_cfg
    from test_integration import make_dataset, H, W, NUM_CLASSES

    ann_file, img_dir = make_dataset(str(tmp_path))
    img_norm = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True, with_mask=False),
        dict(type='Resize', img_scale=(W, H), keep_ratio=True),
        dict(type='Normalize', **img_norm),
        dict(type='Pad', size_divisor=32),
        dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
    ]
    classes = tuple(f'cls{c}' for c in range(NUM_CLASSES))
    cfg = Config.fromdict(dict(
        model=tiny_boxinst_cfg(),
        data=dict(samples_per_gpu=1, workers_per_gpu=1,
                  train=dict(type='CocoDataset', ann_file=ann_file,
                             img_prefix=img_dir, pipeline=pipeline,
                             classes=classes)),
        optimizer=dict(type='SGD', lr=0.002, momentum=0.9,
                       weight_decay=1e-4),
        lr_config=dict(policy='step', by_epoch=False, step=[3],
                       warmup=None),
        runner=dict(type='IterBasedRunner', max_iters=4),
        checkpoint_config=dict(interval=2, by_epoch=False),
        log_config=dict(interval=1),
        canvases=[(H, W)],
        max_gts=8,
        seed=0,
        work_dir=str(tmp_path / 'work'),
    ))
    model = build_detector(cfg.model.copy())
    dataset = build_dataset(cfg.data['train'])
    state = train_detector(model, dataset, cfg)
    assert int(state.step) == 4
    ckpt_dir = os.path.join(cfg.work_dir, 'checkpoints')
    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    # iter-based interval=2 -> checkpoints at 2 and 4 (epoch-based would
    # have multiplied by iters_per_epoch=8 and saved only at the end)
    assert steps == [2, 4]


def test_paramwise_fns_box2mask_recipe():
    """custom_keys lr_mult/decay_mult + norm_decay_mult (reference
    Box2Mask AdamW recipe, box2mask_r50_lsj_8x2_50e_coco.py:131-148)."""
    from boxinstseg_tpu.engine.optimizers import paramwise_fns
    import numpy as np
    cfg = _load('box2mask/box2mask_r50_lsj_8x2_50e_coco.py')
    lr_mult, wd_mult = paramwise_fns(cfg.optimizer)
    assert lr_mult('backbone_m/layer1_0/conv1/kernel') == 0.1
    assert lr_mult('panoptic_head_m/decoder_layer_0/ffn/fc1/kernel') == 1.0
    # embeddings: lr x1, decay 0
    assert wd_mult('panoptic_head_m/query_embed', np.zeros((10, 32))) == 0.0
    assert wd_mult('panoptic_head_m/level_embed', np.zeros((3, 32))) == 0.0
    # norm_decay_mult=0.0
    assert wd_mult('panoptic_head_m/post_norm/scale', np.zeros(32)) == 0.0
    assert wd_mult('panoptic_head_m/cls_embed/kernel',
                   np.zeros((32, 5))) == 1.0


def test_paramwise_fns_swin_recipe():
    """The Swin recipe's custom_keys name mmdet Swin module paths
    (backbone.stages.N.blocks.M.norm etc.); they must translate to THIS
    repo's flax param paths or the reference's 0.1x-lr / decay-0
    backbone-norm rules silently never apply (caught in r4 review)."""
    from boxinstseg_tpu.engine.optimizers import paramwise_fns
    import numpy as np
    cfg = _load('box2mask/box2mask_swin-t-p4-w7-224_lsj_8x2_50e_coco.py')
    lr_mult, wd_mult = paramwise_fns(cfg.optimizer)
    # backbone block norms: lr x0.1, decay 0
    p = 'backbone_m/stage1_block0/norm1/scale'
    assert lr_mult(p) == 0.1
    assert wd_mult(p, np.zeros(96)) == 0.0
    # patch-embed norm / stage-out norms / downsample (merge) norms
    for p in ('backbone_m/patch_norm/scale',
              'backbone_m/out_norm2/bias',
              'backbone_m/merge_norm0/scale'):
        assert lr_mult(p) == 0.1, p
        assert wd_mult(p, np.zeros(96)) == 0.0, p
    # relative position bias tables: lr x0.1, decay 0
    p = 'backbone_m/stage0_block1/attn/relative_position_bias_table'
    assert lr_mult(p) == 0.1
    assert wd_mult(p, np.zeros((169, 3))) == 0.0
    # plain backbone weights: lr x0.1, decay 1.0
    p = 'backbone_m/stage0_block0/attn/qkv/kernel'
    assert lr_mult(p) == 0.1
    assert wd_mult(p, np.zeros((96, 288))) == 1.0
    # head embeddings: lr x1, decay 0; head weights: x1 / 1.0
    assert lr_mult('panoptic_head_m/query_feat') == 1.0
    assert wd_mult('panoptic_head_m/query_feat',
                   np.zeros((100, 256))) == 0.0
    assert wd_mult('panoptic_head_m/cls_embed/kernel',
                   np.zeros((256, 81))) == 1.0


def test_layer_decay_constructor():
    from boxinstseg_tpu.engine.optimizers import paramwise_fns
    opt = dict(type='AdamW', lr=1e-4, weight_decay=0.05,
               constructor='LayerDecayOptimizerConstructor',
               paramwise_cfg=dict(num_layers=6, layer_decay_rate=0.5))
    lr_mult, _ = paramwise_fns(opt)
    # patch embed is deepest-decayed; later blocks decay less; head x1
    m0 = lr_mult('backbone_m/patch_embed/kernel')
    m3 = lr_mult('backbone_m/stage1_block0/attn/qkv/kernel')
    mh = lr_mult('panoptic_head_m/cls_embed/kernel')
    assert m0 == 0.5 ** 7
    assert m3 == 0.5 ** (7 - 3)
    assert mh == 1.0
    assert m0 < m3 < mh
