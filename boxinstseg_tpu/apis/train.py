"""Training orchestration (reference: mmdet/apis/train.py:117-244).

Builds loaders, LR schedule, optimizer, the jitted global-batch train step,
then runs the loop with logging / checkpointing / optional eval — the
runner+hooks stack collapsed into one explicit loop around one compiled
function.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

from ..config import Config
from ..data.batcher import StaticBatcher
from ..data.loader import TrainLoader
from ..engine import (build_lr_schedule, build_optimizer, create_train_state,
                      init_variables, latest_step, make_train_step,
                      make_ts_train_step, restore_checkpoint)
from ..parallel import get_data_mesh, shard_batch
from ..utils.logging import get_root_logger


def _train_resize_cfg(cfg):
    """The train pipeline's Resize step dict (walking dataset
    wrappers), or None."""
    try:
        train = (cfg.get('data') or {})['train']
    except Exception:
        return None
    for _ in range(4):                       # Repeat/ClassBalanced nest
        if isinstance(train, dict) and 'pipeline' not in train \
                and 'dataset' in train:
            train = train['dataset']
        else:
            break
    if not isinstance(train, dict):
        return None
    for step in train.get('pipeline', []) or []:
        if isinstance(step, dict) and step.get('type') == 'Resize':
            return step
    return None


def default_canvases(cfg) -> list:
    """Canvas set for the config's train pipeline (orientation buckets).

    Multiscale-'value' recipes (BoxInst/DiscoBox/BoxLevelset sample
    short sides 640..800, reference configs' Resize img_scale lists)
    waste ~20% of a fixed 800x1344 canvas on a 640 sample. Derive up to
    3 short-side buckets (rounded up to the 32-divisor) so small-scale
    batches land on a smaller compiled step. The loader samples the
    multiscale choice PER BATCH (TrainLoader.batch_scales) so a batch
    actually fits its bucket; per-image marginals are unchanged.
    """
    rs = _train_resize_cfg(cfg)
    base = [(800, 1344), (1344, 800)]
    if not rs:
        return base
    scales = rs.get('img_scale')
    if rs.get('ratio_range') is not None \
            or rs.get('multiscale_mode', 'range') != 'value' \
            or not isinstance(scales, (list, tuple)) or not scales \
            or not isinstance(scales[0], (list, tuple)):
        return base
    up32 = lambda v: -(-int(v) // 32) * 32   # noqa: E731
    shorts = sorted({min(s) for s in scales})
    long32 = up32(max(max(s) for s in scales))
    k = min(3, len(shorts))
    tops = sorted({shorts[-(-((i + 1) * len(shorts)) // k) - 1]
                   for i in range(k)})
    out = []
    for t in tops:
        out += [(up32(t), long32), (long32, up32(t))]
    return out


def batch_scale_choices(cfg):
    """Per-batch multiscale list for TrainLoader (None = per-image)."""
    rs = _train_resize_cfg(cfg)
    if not rs or rs.get('ratio_range') is not None:
        return None
    scales = rs.get('img_scale')
    if rs.get('multiscale_mode', 'range') == 'value' \
            and isinstance(scales, (list, tuple)) and len(scales) > 1 \
            and isinstance(scales[0], (list, tuple)):
        return [tuple(s) for s in scales]
    return None


def apply_precision_policy(cfg) -> bool:
    """Enable bf16 mixed precision when the config asks for it.

    Honors both the reference's ``fp16 = dict(loss_scale=...)`` key (the
    DiscoBox recipe, reference discobox_solov2_coco_r50_fpn_3x.py:1 — on
    TPU bf16 needs no loss scaling) and a native ``bf16 = True``.
    """
    from ..models.layers import set_compute_dtype
    want = bool(cfg.get('bf16', False)) or cfg.get('fp16') is not None \
        if hasattr(cfg, 'get') else False
    if want:
        import jax.numpy as jnp
        set_compute_dtype(jnp.bfloat16)
    else:
        set_compute_dtype(None)
    return want


def resolve_intervals(cfg: Config, iters_per_epoch: int) -> Dict[str, Any]:
    """Resolve mmcv ``by_epoch`` semantics into absolute iteration counts.

    Reference semantics (mmcv LrUpdaterHook / CheckpointHook, mmdet
    apis/train.py:226-227):
    - ``lr_config.by_epoch`` (default True): step epochs -> iters.
    - ``checkpoint_config.by_epoch`` (default True): interval in epochs
      unless set False (Box2Mask: interval=5000 iters, by_epoch=False).
    - ``evaluation.by_epoch`` is derived from the runner type
      (IterBasedRunner -> False), NOT from the evaluation dict.
    """
    runner_cfg = cfg.get('runner', {'type': 'EpochBasedRunner',
                                    'max_epochs': 12})
    by_epoch_runner = runner_cfg.get('type') != 'IterBasedRunner'
    if by_epoch_runner:
        max_iters = runner_cfg.get('max_epochs', 12) * iters_per_epoch
    else:
        max_iters = runner_cfg['max_iters']

    lr_cfg = dict(cfg.get('lr_config') or {})
    lr_by_epoch = lr_cfg.get('by_epoch', True)

    ckpt_cfg = dict(cfg.get('checkpoint_config') or {})
    ckpt_iters = ckpt_cfg.get('interval', 1) * (
        iters_per_epoch if ckpt_cfg.get('by_epoch', True) else 1)

    eval_cfg = dict(cfg.get('evaluation') or {})
    eval_iters = eval_cfg.get('interval', 1) * (
        iters_per_epoch if by_epoch_runner else 1)
    dynamic = eval_cfg.get('dynamic_intervals')

    return dict(max_iters=max_iters, lr_by_epoch=lr_by_epoch,
                ckpt_interval_iters=int(ckpt_iters),
                ckpt_max_keep=ckpt_cfg.get('max_keep_ckpts', 3),
                ckpt_save_last=ckpt_cfg.get('save_last', True),
                eval_interval_iters=int(eval_iters),
                eval_dynamic_intervals=dynamic,
                eval_metrics=eval_cfg.get('metric', ('bbox', 'segm')))


def _model_num_classes(model_cfg: dict):
    """First num_classes/num_things_classes found in the model cfg tree."""
    for key in ('num_classes', 'num_things_classes'):
        for sub in model_cfg.values():
            if isinstance(sub, dict) and key in sub:
                return sub[key]
    return None


def train_detector(model, dataset, cfg: Config,
                   validate: bool = False, val_dataset=None,
                   resume_from: Optional[str] = None,
                   init_params=None):
    import jax
    import jax.numpy as jnp

    work_dir = cfg.get('work_dir')
    if work_dir:
        os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(
        log_file=os.path.join(work_dir, 'train.log') if work_dir else None)

    if apply_precision_policy(cfg):
        logger.info('mixed precision: bf16 activations, f32 params/losses')

    data_cfg = cfg.get('data', {})
    samples_per_gpu = data_cfg.get('samples_per_gpu', 2)
    n_dev = jax.device_count()               # global across processes
    global_batch = samples_per_gpu * n_dev
    mesh = get_data_mesh()
    proc_id, proc_n = jax.process_index(), jax.process_count()
    if proc_n > 1:
        logger.info(f'multi-host: process {proc_id}/{proc_n}, '
                    f'{n_dev} global devices, global batch {global_batch}')

    mask_head_cfg = cfg.model.get('mask_head', {}) or {}
    batcher = StaticBatcher(
        canvases=cfg.get('canvases', default_canvases(cfg)),
        max_gts=cfg.get('max_gts', 100),
        bottom_pixels_removed=mask_head_cfg.get('bottom_pixels_removed', 10),
        with_masks=bool(cfg.get('with_gt_masks',
                                not mask_head_cfg.get('boxinst_enabled',
                                                      True))),
        mask_stride=4,
        gt_buckets=cfg.get('gt_buckets'),
    )
    loader = TrainLoader(dataset, global_batch, batcher,
                         num_workers=data_cfg.get('workers_per_gpu', 2)
                         * max(jax.local_device_count(), 4),
                         seed=cfg.get('seed', 0),
                         process_id=proc_id, process_count=proc_n,
                         batch_scales=batch_scale_choices(cfg))

    iters_per_epoch = max(len(dataset) // global_batch, 1)
    iv = resolve_intervals(cfg, iters_per_epoch)
    max_iters = iv['max_iters']
    iv['train_dataset'] = dataset
    iv['max_epochs'] = max(max_iters // iters_per_epoch, 1)

    base_lr = cfg.optimizer['lr']
    if cfg.get('auto_scale_lr', {}).get('enable', False):
        base = cfg['auto_scale_lr'].get('base_batch_size', 16)
        base_lr = base_lr * global_batch / base
    sched = build_lr_schedule(cfg.get('lr_config', {}), base_lr,
                              iters_per_epoch, by_epoch=iv['lr_by_epoch'],
                              max_iters=max_iters)

    num_classes = _model_num_classes(cfg.model)
    if num_classes is not None and hasattr(dataset, 'CLASSES'):
        from ..engine.hooks import num_class_check
        num_class_check(dataset, num_classes)

    # init / resume ----------------------------------------------------------
    first = next(iter(loader))
    first = {k: jnp.asarray(v) for k, v in first.items()}
    variables = init_variables(model, {'params': jax.random.PRNGKey(
        cfg.get('seed', 0))}, first, jnp.zeros((), jnp.int32),
        method=model.loss)
    if init_params is not None:  # pretrained backbone etc.
        variables = _merge_pretrained(variables, init_params)

    # paramwise lr/decay multipliers (custom_keys, norm_decay_mult,
    # LayerDecayOptimizerConstructor) resolve inside build_optimizer
    tx = build_optimizer(cfg.optimizer, sched,
                         optimizer_config=cfg.get('optimizer_config'),
                         params_example=variables['params'])
    use_ts = cfg.model.get('type') in ('DiscoBoxSOLOv2',
                                       'SingleStageWSInsTSDetector')
    # cross-image correspondence object bank (reference ObjectQueues,
    # discobox_head.py:132-227 + :729-744): a device-resident per-class
    # ring buffer carried in the train state and appended inside the
    # jitted TS step
    corr_state = None
    if use_ts:
        head_cfg = dict(cfg.model.get('bbox_head', {}) or {})
        lc = head_cfg.get('loss_corr')
        if lc:
            from ..ops.correspondence import create_object_bank
            ob = dict(lc.get('obj_bank', {}))
            corr_state = create_object_bank(
                int(head_cfg['num_classes']),
                int(ob.get('len_object_queues', 100)),
                (int(ob.get('feat_height', 7)),
                 int(ob.get('feat_width', 7))),
                (int(ob.get('mask_height', 28)),
                 int(ob.get('mask_width', 28))),
                int(cfg.model.get('neck', {}).get('out_channels', 256)))
    state = create_train_state(model, variables, tx, ema=use_ts,
                               corr_state=corr_state)

    work_dir = cfg.get('work_dir', './work_dir')
    ckpt_dir = os.path.join(work_dir, 'checkpoints')
    if resume_from or (cfg.get('auto_resume') and latest_step(ckpt_dir)):
        restored = restore_checkpoint(resume_from or ckpt_dir, state)
        if restored is not None:
            state = restored
            logger.info(f'resumed from step {int(state.step)}')

    if use_ts:
        ts_cfg = dict(cfg.get('ts_cfg', {}))
        step_fn = make_ts_train_step(
            model, tx, mesh=mesh,
            momentum=ts_cfg.get('momentum', 0.999),
            start_iter=ts_cfg.get('start_iter', 13000),
            ts_thresh=ts_cfg.get('ts_thresh', 0.3),
            corr_thresh=ts_cfg.get('corr_thresh', 0.2))
    else:
        step_fn = make_train_step(model, tx, mesh=mesh)
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    state = jax.device_put(state, repl)

    # logging hooks run on process 0 only (reference rank-0 gating);
    # checkpointing must run on EVERY process — orbax coordinates saves
    # with a cross-process barrier, so a rank-gated save would deadlock —
    # and so must EvalHook: run_evaluation shards the val set across
    # processes and gathers through a global barrier (reference
    # DistEvalHook + multi_gpu_test)
    hooks = build_hooks(model, cfg, iv, ckpt_dir, logger=logger,
                        global_batch=global_batch, lr_fn=sched,
                        validate=validate, val_dataset=val_dataset,
                        classes=getattr(dataset, 'CLASSES', None))
    if proc_id != 0:
        from ..engine.hooks import CheckpointHook, EvalHook
        hooks = [h for h in hooks
                 if isinstance(h, (CheckpointHook, EvalHook))]

    start = int(state.step)
    it = iter(loader)
    for i in range(start, max_iters):
        batch = shard_batch(next(it), mesh)
        state, logs = step_fn(state, batch)
        for h in hooks:
            h.after_step(i, state, logs)
        if (i + 1) % iters_per_epoch == 0:
            epoch = (i + 1) // iters_per_epoch - 1
            for h in hooks:
                h.after_epoch(epoch, state)
    return state


def build_hooks(model, cfg: Config, iv: Dict[str, Any], ckpt_dir: str,
                logger=None, global_batch: int = 1, lr_fn=None,
                validate: bool = False, val_dataset=None,
                classes=None) -> list:
    """Assemble the hook list from the config, mirroring the reference
    runner's hook registration (mmdet/apis/train.py:164-231): logger hooks
    from log_config, checkpoint, eval, then custom_hooks."""
    from ..engine.hooks import (CheckLossHook, CheckpointHook, EMAHook,
                                EvalHook, MemoryProfilerHook, TextLoggerHook,
                                WandbLoggerHook)
    log_cfg = dict(cfg.get('log_config') or {})
    log_interval = log_cfg.get('interval', 50)
    hooks = [TextLoggerHook(log_interval, logger, global_batch,
                            iv['max_iters'], lr_fn=lr_fn),
             CheckLossHook(log_interval)]
    for h in log_cfg.get('hooks', []):
        if h.get('type') in ('MMDetWandbHook', 'WandbLoggerHook'):
            hooks.append(WandbLoggerHook(h.get('interval', log_interval),
                                         h.get('init_kwargs')))
    from .. import __version__
    meta = dict(version=__version__, seed=cfg.get('seed'),
                exp_name=os.path.basename(cfg.filename or ''),
                CLASSES=list(classes or cfg.get('classes') or []))
    hooks.append(CheckpointHook(ckpt_dir, iv['ckpt_interval_iters'],
                                iv['ckpt_max_keep'], iv['ckpt_save_last'],
                                iv['max_iters'], logger, meta=meta))
    if validate and val_dataset is not None:
        hooks.append(EvalHook(model, val_dataset, cfg,
                              iv['eval_interval_iters'], iv['eval_metrics'],
                              logger, iv['eval_dynamic_intervals']))
    for h in cfg.get('custom_hooks', []) or []:
        t = h.get('type')
        if t == 'MemoryProfilerHook':
            hooks.append(MemoryProfilerHook(h.get('interval', 500), logger))
        elif t == 'EMAHook':
            hooks.append(EMAHook(h.get('momentum', 0.999),
                                 h.get('interval', 1)))
        elif t == 'ProfilerHook':
            from ..engine.hooks import ProfilerHook
            hooks.append(ProfilerHook(h.get('start', 50), h.get('stop', 55),
                                      h.get('log_dir', './profile'),
                                      logger))
        elif t == 'ExpMomentumEMAHook':
            from ..engine.hooks import ExpMomentumEMAHook
            hooks.append(ExpMomentumEMAHook(h.get('momentum', 0.0002),
                                            h.get('total_iter', 2000),
                                            h.get('interval', 1)))
        elif t == 'LinearMomentumEMAHook':
            from ..engine.hooks import LinearMomentumEMAHook
            hooks.append(LinearMomentumEMAHook(h.get('momentum', 0.0002),
                                               h.get('warm_up', 100),
                                               h.get('interval', 1)))
        elif t == 'SetEpochInfoHook':
            from ..engine.hooks import SetEpochInfoHook
            hooks.append(SetEpochInfoHook(model))
        elif t == 'YOLOXModeSwitchHook':
            from ..engine.hooks import YOLOXModeSwitchHook
            hooks.append(YOLOXModeSwitchHook(
                h.get('num_last_epochs', 15),
                h.get('skip_type_keys',
                      ('Mosaic', 'RandomAffine', 'MixUp')),
                model, iv.get('train_dataset'),
                iv.get('max_epochs', 0), logger))
        elif t in ('SyncNormHook', 'SyncRandomSizeHook'):
            from ..engine import hooks as _h
            hooks.append(getattr(_h, t)())
        # NumClassCheckHook handled up-front in train_detector.
    return hooks


def _merge_pretrained(variables, init):
    """Overlay converted pretrained params/batch_stats onto fresh init."""
    import jax
    params, stats = init

    def overlay(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and k in out:
                out[k] = overlay(out[k], v)
            else:
                out[k] = v
        return out

    variables = dict(variables)
    variables['params'] = overlay(dict(variables['params']), params or {})
    if stats:
        variables['batch_stats'] = overlay(
            dict(variables.get('batch_stats', {})), stats)
    return variables
