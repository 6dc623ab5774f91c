"""Training-loop callbacks (reference: mmcv hook system + mmdet/core/hook).

The reference registers ~10 hooks on the runner; here the training loop is
explicit, and these callbacks cover the same capabilities. Each hook gets
``after_step(i, state, logs)`` / ``after_epoch(epoch, state)`` calls.

Reference-hook mapping:
- TextLoggerHook / IterTimerHook  -> TextLoggerHook (timing + loss lines)
- CheckLossHook (checkloss_hook)  -> CheckLossHook (NaN/Inf abort)
- CheckpointHook                  -> CheckpointHook (orbax)
- EvalHook (eval_hooks.py)        -> EvalHook
- EMAHook (core/hook/ema.py)      -> EMAHook (generic parameter EMA; the
  DiscoBox momentum teacher is engine-native in make_ts_train_step)
- Exp/LinearMomentumEMAHook       -> momentum-scheduled EMA subclasses
- SetEpochInfoHook                -> SetEpochInfoHook
- YOLOXModeSwitchHook             -> YOLOXModeSwitchHook (skip-type keys
  + use_l1); YOLOXLrUpdaterHook -> engine/schedules.py yolox_lr_schedule
- NumClassCheckHook               -> num_class_check() (dataset vs head)
- SyncNormHook / SyncRandomSizeHook: unnecessary under pjit — BN stats
  and shapes are global by construction (no-op classes kept so configs
  naming them still build).
- MemoryProfilerHook              -> MemoryProfilerHook (device stats)
- MMDetWandbHook                  -> WandbLoggerHook (no-ops without wandb)
"""
from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import numpy as np


class Hook:
    def after_step(self, i: int, state, logs: Dict) -> None:
        pass

    def after_epoch(self, epoch: int, state) -> None:
        pass


class TextLoggerHook(Hook):
    def __init__(self, interval: int = 50, logger=None,
                 global_batch: int = 1, max_iters: int = 0, lr_fn=None):
        from ..utils.logging import get_root_logger
        self.interval = interval
        self.logger = logger or get_root_logger()
        self.global_batch = global_batch
        self.max_iters = max_iters
        self.lr_fn = lr_fn  # optional schedule(step) -> lr, logged lazily
        self._t = time.perf_counter()

    def after_step(self, i, state, logs):
        if (i + 1) % self.interval:
            return
        vals = {k: float(v) for k, v in logs.items()
                if np.ndim(v) == 0}
        dt = (time.perf_counter() - self._t) / self.interval
        self._t = time.perf_counter()
        lr = f'lr: {float(self.lr_fn(i)):.2e} ' if self.lr_fn else ''
        msg = ', '.join(f'{k}: {v:.4f}' for k, v in sorted(vals.items()))
        self.logger.info(
            f'Iter [{i + 1}/{self.max_iters}] {lr}time: {dt:.3f}s/iter '
            f'({self.global_batch / max(dt, 1e-9):.1f} img/s) {msg}')


class CheckLossHook(Hook):
    """Abort on non-finite loss (reference: CheckLossHook)."""

    def __init__(self, interval: int = 50):
        self.interval = interval

    def after_step(self, i, state, logs):
        if (i + 1) % self.interval:
            return
        total = float(logs.get('loss', 0.0))
        if not np.isfinite(total):
            raise FloatingPointError(
                f'non-finite loss at iter {i + 1}: '
                f'{ {k: float(v) for k, v in logs.items() if np.ndim(v) == 0} }')


class CheckpointHook(Hook):
    """Periodic orbax checkpoints; ``save_last`` also saves at max_iters
    (reference: mmcv CheckpointHook ``by_epoch``/``save_last`` — the caller
    converts the config interval to iterations honoring ``by_epoch``)."""

    def __init__(self, ckpt_dir: str, interval_iters: int,
                 max_keep_ckpts: int = 3, save_last: bool = True,
                 max_iters: int = 0, logger=None, meta=None):
        from ..utils.logging import get_root_logger
        self.ckpt_dir = ckpt_dir
        self.interval = max(int(interval_iters), 1)
        self.max_keep = max_keep_ckpts
        self.save_last = save_last
        self.max_iters = max_iters
        self.logger = logger or get_root_logger()
        self.meta = meta

    def after_step(self, i, state, logs):
        last = self.save_last and (i + 1) == self.max_iters
        if (i + 1) % self.interval and not last:
            return
        import jax
        from .checkpoints import save_checkpoint
        save_checkpoint(self.ckpt_dir, jax.device_get(state), i + 1,
                        max_to_keep=self.max_keep, meta=self.meta)
        self.logger.info(f'checkpoint saved at iter {i + 1}')


class EvalHook(Hook):
    """Periodic evaluation (reference: mmdet eval_hooks.py — ``by_epoch``
    resolved by the caller, ``dynamic_intervals`` as [(start_iter,
    new_interval), ...] switching the interval once training passes
    start_iter, matching mmdet's dynamic-interval EvalHook)."""

    def __init__(self, model, dataset, cfg, interval_iters: int,
                 metrics=('bbox', 'segm'), logger=None,
                 dynamic_intervals=None):
        from ..utils.logging import get_root_logger
        self.model = model
        self.dataset = dataset
        self.cfg = cfg
        self.interval = max(int(interval_iters), 1)
        self.metrics = metrics
        self.logger = logger or get_root_logger()
        self.dynamic = sorted(dynamic_intervals or [])
        self.latest_metrics: Dict[str, Any] = {}

    def _interval_at(self, i):
        interval = self.interval
        for start, new_interval in self.dynamic:
            if i + 1 >= start:
                interval = new_interval
        return max(int(interval), 1)

    def after_step(self, i, state, logs):
        if (i + 1) % self._interval_at(i):
            return
        from ..apis.test import run_evaluation
        m = run_evaluation(self.model, state.variables(), self.dataset,
                           self.cfg, metrics=self.metrics)
        self.latest_metrics = m
        self.logger.info(f'eval @ iter {i + 1}: {m}')


class EMAHook(Hook):
    """Generic parameter EMA kept host-side (reference: core/hook/ema.py
    BaseEMAHook — ema = (1 - m(t)) * ema + m(t) * param). For the
    DiscoBox teacher use make_ts_train_step (EMA inside jit).

    ``momentum`` follows OUR keep-rate convention (ema = m*ema +
    (1-m)*p, m close to 1); ``momentum_fun(iter)`` — when set by the
    momentum-scheduled subclasses — returns the reference's update rate
    m_ref(t), applied as keep-rate 1 - m_ref(t)."""

    def __init__(self, momentum: float = 0.999, interval: int = 1,
                 momentum_fun=None):
        self.momentum = momentum
        self.interval = interval
        self.momentum_fun = momentum_fun
        self.ema_params = None

    def _keep_rate(self, i: int) -> float:
        if self.momentum_fun is not None:
            return 1.0 - float(self.momentum_fun(i))
        return self.momentum

    def after_step(self, i, state, logs):
        if (i + 1) % self.interval:
            return
        import jax
        if self.ema_params is None:
            self.ema_params = jax.tree_util.tree_map(
                lambda x: x, state.params)
        else:
            m = self._keep_rate(i)
            self.ema_params = jax.tree_util.tree_map(
                lambda e, p: m * e + (1 - m) * p, self.ema_params,
                state.params)


class ExpMomentumEMAHook(EMAHook):
    """EMA with exponentially decaying update rate (reference ema.py:45-56
    ExpMomentumEMAHook): m_ref(t) = (1 - m0) * exp(-(1+t)/total) + m0."""

    def __init__(self, momentum: float = 0.0002, total_iter: int = 2000,
                 interval: int = 1):
        import math
        super().__init__(
            interval=interval,
            momentum_fun=lambda x: (1 - momentum) * math.exp(
                -(1 + x) / total_iter) + momentum)


class LinearMomentumEMAHook(EMAHook):
    """EMA with linearly warming update rate (reference ema.py:59-71
    LinearMomentumEMAHook): m_ref(t) = min(m0^interval, (1+t)/(w*t+1))
    per-update."""

    def __init__(self, momentum: float = 0.0002, warm_up: int = 100,
                 interval: int = 1):
        super().__init__(
            interval=interval,
            momentum_fun=lambda x: min(
                momentum ** interval,
                (1 + x) / (warm_up + x)))


class SetEpochInfoHook(Hook):
    """Pushes the current epoch into the model (reference:
    core/hook/set_epoch_info_hook.py calling model.set_epoch). Models
    that care implement ``set_epoch(epoch)``; the step counter already
    rides in the TrainState for traced logic."""

    def __init__(self, model=None):
        self.model = model

    def after_epoch(self, epoch, state):
        if self.model is not None and hasattr(self.model, 'set_epoch'):
            self.model.set_epoch(epoch + 1)


class SyncNormHook(Hook):
    """reference: core/hook/sync_norm_hook.py all-reduces BN buffers
    across ranks before eval. Under a single pjit-compiled global-batch
    step, norm statistics are computed on the global batch by
    construction, so this is a documented no-op kept for config
    compatibility."""

    def __init__(self, *args, **kwargs):
        pass


class SyncRandomSizeHook(Hook):
    """reference: core/hook/sync_random_size_hook.py broadcasts a random
    train-image size across ranks. Static XLA shapes make per-step random
    sizes a recompile per size; multi-scale is handled by the canvas
    buckets in the batcher instead. No-op for config compatibility."""

    def __init__(self, *args, **kwargs):
        pass


class YOLOXModeSwitchHook(Hook):
    """Disable mosaic/mixup and switch on the head's L1 loss for the last
    ``num_last_epochs`` (reference: core/hook/yolox_mode_switch_hook.py).
    Works through MultiImageMixDataset.update_skip_type_keys and a
    ``use_l1`` attribute on the head when present."""

    def __init__(self, num_last_epochs: int = 15,
                 skip_type_keys=('Mosaic', 'RandomAffine', 'MixUp'),
                 model=None, dataset=None, max_epochs: int = 0,
                 logger=None):
        from ..utils.logging import get_root_logger
        self.num_last_epochs = num_last_epochs
        self.skip_type_keys = tuple(skip_type_keys)
        self.model = model
        self.dataset = dataset
        self.max_epochs = max_epochs
        self.logger = logger or get_root_logger()

    def after_epoch(self, epoch, state):
        if (epoch + 2) != self.max_epochs - self.num_last_epochs + 1:
            return
        if self.dataset is not None and hasattr(self.dataset,
                                                'update_skip_type_keys'):
            self.dataset.update_skip_type_keys(self.skip_type_keys)
            self.logger.info('No mosaic and mixup aug now!')
        head = getattr(self.model, 'bbox_head', None)
        if head is not None and hasattr(head, 'use_l1'):
            head.use_l1 = True
            self.logger.info('Add additional L1 loss now!')


class MemoryProfilerHook(Hook):
    def __init__(self, interval: int = 500, logger=None):
        from ..utils.logging import get_root_logger
        self.interval = interval
        self.logger = logger or get_root_logger()

    def after_step(self, i, state, logs):
        if (i + 1) % self.interval:
            return
        from ..utils.profiling import device_memory_stats
        for dev, stats in device_memory_stats().items():
            if stats:
                used = stats.get('bytes_in_use', 0) / 2 ** 30
                self.logger.info(f'{dev}: {used:.2f} GiB in use')


class ProfilerHook(Hook):
    """Capture a jax.profiler trace over a step window (reference:
    mmdet/utils/profiling.py profile_time / mmcv ProfilerHook).
    Config: custom_hooks = [dict(type='ProfilerHook', start=50, stop=55,
    log_dir=...)]; trace opens in TensorBoard / Perfetto."""

    def __init__(self, start: int = 50, stop: int = 55,
                 log_dir: str = './profile', logger=None):
        from ..utils.logging import get_root_logger
        self.start = start
        self.stop = stop
        self.log_dir = log_dir
        self.logger = logger or get_root_logger()
        self._active = False

    def after_step(self, i, state, logs):
        import jax
        if (i + 1) == self.start and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            self.logger.info(f'profiler trace started -> {self.log_dir}')
        elif (i + 1) == self.stop and self._active:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready()
                if hasattr(x, 'block_until_ready') else x, logs)
            jax.profiler.stop_trace()
            self._active = False
            self.logger.info('profiler trace stopped')


class WandbLoggerHook(Hook):
    """Logs scalars to wandb when available (reference:
    MMDetWandbHook, 586 LoC); silently no-ops otherwise."""

    def __init__(self, interval: int = 50, init_kwargs: Optional[dict] = None):
        self.interval = interval
        try:
            import wandb
            self.wandb = wandb
            wandb.init(**(init_kwargs or {}))
        except Exception:
            self.wandb = None

    def after_step(self, i, state, logs):
        if self.wandb is None or (i + 1) % self.interval:
            return
        self.wandb.log({k: float(v) for k, v in logs.items()
                        if np.ndim(v) == 0}, step=i + 1)


def num_class_check(dataset, model_num_classes: int) -> None:
    """reference: NumClassCheckHook — dataset CLASSES must match the
    head's num_classes."""
    n = len(dataset.CLASSES)
    if n != model_num_classes:
        raise ValueError(
            f'dataset has {n} classes but the head predicts '
            f'{model_num_classes}')
