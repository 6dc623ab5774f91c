"""LR schedules matching mmcv's LrUpdaterHook semantics
(reference: lr_config in configs/_base_/schedules/schedule_1x.py — linear
warmup + step decay at epoch boundaries)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def step_lr_schedule(base_lr: float,
                     warmup: Optional[str] = 'linear',
                     warmup_iters: int = 500,
                     warmup_ratio: float = 0.001,
                     step_iters: Sequence[int] = (),
                     gamma: float = 0.1):
    """Returns lr(step) callable (optax-compatible).

    mmcv linear warmup: lr_i = base * (1 - (1 - i/warmup_iters) *
    (1 - warmup_ratio)); afterwards base * gamma^{#passed steps}.
    ``step_iters`` are absolute iteration indices (epochs converted by the
    caller using iters_per_epoch).
    """
    steps = jnp.asarray(sorted(step_iters), jnp.float32) if len(step_iters) \
        else None

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        lr = jnp.asarray(base_lr, jnp.float32)
        if steps is not None:
            n_passed = (count >= steps).sum().astype(jnp.float32)
            lr = lr * (gamma ** n_passed)
        if warmup == 'linear' and warmup_iters > 0:
            frac = jnp.clip(count / warmup_iters, 0.0, 1.0)
            wf = 1.0 - (1.0 - frac) * (1.0 - warmup_ratio)
            lr = jnp.where(count < warmup_iters,
                           jnp.asarray(base_lr, jnp.float32) * wf, lr)
        elif warmup == 'constant' and warmup_iters > 0:
            lr = jnp.where(count < warmup_iters, base_lr * warmup_ratio, lr)
        return lr

    return schedule


def poly_lr_schedule(base_lr: float, max_iters: int, power: float = 0.9,
                     min_lr: float = 0.0,
                     warmup: Optional[str] = 'linear',
                     warmup_iters: int = 0, warmup_ratio: float = 0.001):
    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        frac = jnp.clip(count / max_iters, 0.0, 1.0)
        lr = (base_lr - min_lr) * (1.0 - frac) ** power + min_lr
        if warmup == 'linear' and warmup_iters > 0:
            wfrac = jnp.clip(count / warmup_iters, 0.0, 1.0)
            wf = 1.0 - (1.0 - wfrac) * (1.0 - warmup_ratio)
            lr = jnp.where(count < warmup_iters, base_lr * wf, lr)
        return lr
    return schedule


def build_lr_schedule(lr_config: dict, base_lr: float, iters_per_epoch: int,
                      by_epoch: bool = True, max_iters: int = 0):
    """Build from an mmcv-style lr_config dict."""
    lr_config = dict(lr_config or {})
    policy = lr_config.get('policy', 'step')
    warmup = lr_config.get('warmup', None)
    warmup_iters = lr_config.get('warmup_iters', 0)
    warmup_ratio = lr_config.get('warmup_ratio', 0.1)
    if policy == 'step':
        steps = lr_config.get('step', [])
        if isinstance(steps, (int, float)):
            steps = [steps]
        step_iters = [int(s * iters_per_epoch) if by_epoch else int(s)
                      for s in steps]
        return step_lr_schedule(base_lr, warmup, warmup_iters, warmup_ratio,
                                step_iters, lr_config.get('gamma', 0.1))
    if policy == 'poly':
        return poly_lr_schedule(base_lr, max_iters,
                                lr_config.get('power', 0.9),
                                lr_config.get('min_lr', 0.0),
                                warmup, warmup_iters, warmup_ratio)
    if policy == 'fixed':
        return step_lr_schedule(base_lr, warmup, warmup_iters, warmup_ratio,
                                (), 1.0)
    if policy in ('CosineAnnealing', 'cosine'):
        return cosine_lr_schedule(base_lr, max_iters,
                                  lr_config.get('min_lr', 0.0),
                                  lr_config.get('min_lr_ratio'),
                                  warmup, warmup_iters, warmup_ratio)
    if policy in ('YOLOX', 'yolox_cosine'):
        # mmdet YOLOXLrUpdaterHook: quadratic warmup from 0, cosine to
        # min_lr_ratio, LR frozen for the last num_last_epochs
        last_iters = int(lr_config.get('num_last_epochs', 15)
                         * iters_per_epoch)
        return yolox_lr_schedule(base_lr, max_iters,
                                 lr_config.get('min_lr_ratio', 0.05),
                                 warmup_iters, last_iters)
    raise ValueError(f'unsupported lr policy {policy}')


def cosine_lr_schedule(base_lr: float, max_iters: int, min_lr: float = 0.0,
                       min_lr_ratio=None, warmup=None, warmup_iters: int = 0,
                       warmup_ratio: float = 0.1):
    """mmcv CosineAnnealingLrUpdaterHook (by_epoch=False form)."""
    import numpy as np
    if min_lr_ratio is not None:
        min_lr = base_lr * min_lr_ratio

    def schedule(count):
        import jax.numpy as jnp
        t = jnp.clip(count / max(max_iters, 1), 0.0, 1.0)
        lr = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(np.pi * t))
        if warmup == 'linear' and warmup_iters > 0:
            k = (1 - count / warmup_iters) * (1 - warmup_ratio)
            lr = jnp.where(count < warmup_iters, base_lr * (1 - k), lr)
        return lr

    return schedule


def yolox_lr_schedule(base_lr: float, max_iters: int,
                      min_lr_ratio: float = 0.05, warmup_iters: int = 0,
                      last_iters: int = 0):
    """mmdet YOLOXLrUpdaterHook: quadratic warmup starting at lr=0, then
    cosine annealing to base_lr * min_lr_ratio, held constant over the
    final ``last_iters`` (reference core/hook/yolox_lrupdater_hook.py)."""
    import numpy as np
    min_lr = base_lr * min_lr_ratio

    def schedule(count):
        import jax.numpy as jnp
        warm = base_lr * (count / max(warmup_iters, 1)) ** 2
        span = max(max_iters - last_iters - warmup_iters, 1)
        t = jnp.clip((count - warmup_iters) / span, 0.0, 1.0)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(np.pi * t))
        lr = jnp.where(count < warmup_iters, warm,
                       jnp.where(count >= max_iters - last_iters, min_lr,
                                 cos))
        return lr

    return schedule
