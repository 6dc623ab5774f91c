"""Training orchestration (reference: mmdet/apis/train.py:117-244).

Builds loaders, LR schedule, optimizer, the jitted global-batch train step,
then runs the loop with logging / checkpointing / optional eval — the
runner+hooks stack collapsed into one explicit loop around one compiled
function.
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import numpy as np

from ..config import Config
from ..data.batcher import StaticBatcher
from ..data.loader import TrainLoader
from ..engine import (build_lr_schedule, build_optimizer, create_train_state,
                      init_variables, latest_step, make_train_step,
                      make_ts_train_step, restore_checkpoint,
                      save_checkpoint)
from ..parallel import get_data_mesh, shard_batch
from ..utils.logging import get_root_logger


def default_canvases(cfg) -> list:
    """Canvas set for the config's train pipeline (orientation buckets)."""
    return [(800, 1344), (1344, 800)]


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

    data_cfg = cfg.get('data', {})
    samples_per_gpu = data_cfg.get('samples_per_gpu', 2)
    n_dev = len(jax.devices())
    global_batch = samples_per_gpu * n_dev
    mesh = get_data_mesh()

    mask_head_cfg = cfg.model.get('mask_head', {}) or {}
    batcher = StaticBatcher(
        canvases=cfg.get('canvases', default_canvases(cfg)),
        max_gts=cfg.get('max_gts', 100),
        bottom_pixels_removed=mask_head_cfg.get('bottom_pixels_removed', 10),
        with_masks=bool(cfg.get('with_gt_masks',
                                not mask_head_cfg.get('boxinst_enabled',
                                                      True))),
        mask_stride=4,
    )
    loader = TrainLoader(dataset, global_batch, batcher,
                         num_workers=data_cfg.get('workers_per_gpu', 2)
                         * max(n_dev, 4),
                         seed=cfg.get('seed', 0))

    runner_cfg = cfg.get('runner', {'type': 'EpochBasedRunner',
                                    'max_epochs': 12})
    iters_per_epoch = max(len(dataset) // global_batch, 1)
    if runner_cfg.get('type') == 'IterBasedRunner':
        max_iters = runner_cfg['max_iters']
    else:
        max_iters = runner_cfg.get('max_epochs', 12) * iters_per_epoch

    base_lr = cfg.optimizer['lr']
    if cfg.get('auto_scale_lr', {}).get('enable', False):
        base = cfg['auto_scale_lr'].get('base_batch_size', 16)
        base_lr = base_lr * global_batch / base
    sched = build_lr_schedule(cfg.get('lr_config', {}), base_lr,
                              iters_per_epoch, max_iters=max_iters)

    # init / resume ----------------------------------------------------------
    first = next(iter(loader))
    first = {k: jnp.asarray(v) for k, v in first.items()}
    variables = init_variables(model, {'params': jax.random.PRNGKey(
        cfg.get('seed', 0))}, first, jnp.zeros((), jnp.int32),
        method=model.loss)
    if init_params is not None:  # pretrained backbone etc.
        variables = _merge_pretrained(variables, init_params)

    paramwise_lr_fn = _paramwise_lr_fn(cfg.optimizer)
    tx = build_optimizer(cfg.optimizer, sched,
                         optimizer_config=cfg.get('optimizer_config'),
                         params_example=variables['params'],
                         paramwise_lr_fn=paramwise_lr_fn)
    use_ts = cfg.model.get('type') in ('DiscoBoxSOLOv2',
                                       'SingleStageWSInsTSDetector')
    state = create_train_state(model, variables, tx, ema=use_ts)

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
            ts_thresh=ts_cfg.get('ts_thresh', 0.3))
    else:
        step_fn = make_train_step(model, tx, mesh=mesh)
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    state = jax.device_put(state, repl)

    log_interval = cfg.get('log_config', {}).get('interval', 50)
    ckpt_interval_epochs = cfg.get('checkpoint_config', {}).get('interval', 1)
    start = int(state.step)
    t_last = time.perf_counter()
    it = iter(loader)
    for i in range(start, max_iters):
        batch = shard_batch(next(it), mesh)
        state, logs = step_fn(state, batch)
        if (i + 1) % log_interval == 0:
            logs = {k: float(v) for k, v in logs.items()}
            dt = (time.perf_counter() - t_last) / log_interval
            t_last = time.perf_counter()
            lr_now = float(sched(i))
            msg = ', '.join(f'{k}: {v:.4f}' for k, v in sorted(logs.items()))
            logger.info(
                f'Iter [{i + 1}/{max_iters}] lr: {lr_now:.2e} '
                f'time: {dt:.3f}s/iter ({global_batch / dt:.1f} img/s) '
                f'{msg}')
            if not np.isfinite(logs['loss']):
                raise FloatingPointError(
                    f'non-finite loss at iter {i + 1}: {logs}')
        if (i + 1) % (ckpt_interval_epochs * iters_per_epoch) == 0 \
                or (i + 1) == max_iters:
            save_checkpoint(ckpt_dir, jax.device_get(state), i + 1,
                            max_to_keep=cfg.get('checkpoint_config', {})
                            .get('max_keep_ckpts', 3))
            logger.info(f'checkpoint saved at iter {i + 1}')
            if validate and val_dataset is not None:
                from .test import run_evaluation
                metrics = run_evaluation(model, state.variables(),
                                         val_dataset, cfg)
                logger.info(f'eval @ iter {i + 1}: {metrics}')
    return state


def _paramwise_lr_fn(optimizer_cfg):
    """mmcv paramwise_cfg.custom_keys -> per-parameter LR multipliers
    (reference: Box2Mask AdamW recipe — backbone lr x0.1, embeddings
    decay 0)."""
    custom = (optimizer_cfg.get('paramwise_cfg', {}) or {}).get(
        'custom_keys', {})
    if not custom:
        return None
    # longest-prefix-match on the path string
    keys = sorted(custom.items(), key=lambda kv: -len(kv[0]))

    def fn(path: str) -> float:
        lowered = path.lower()
        for key, spec in keys:
            k = key.replace('backbone', 'backbone_m').replace('.', '/')
            if k.lower() in lowered:
                return float(spec.get('lr_mult', 1.0))
        return 1.0

    return fn


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
