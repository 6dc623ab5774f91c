"""Optimizer construction from mmcv-style optimizer configs
(reference: mmcv build_optimizer via apis/train.py:181; paramwise options
used by Box2Mask configs — backbone lr mult, zero decay for embeddings)."""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import jax
import optax


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, 'key'):
            parts.append(str(p.key))
        elif hasattr(p, 'idx'):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return '/'.join(parts)


def _mask_from_predicate(params, pred: Callable[[str, Any], bool]):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: pred(_path_str(path), leaf), params)


def default_wd_mask(params):
    """torch applies weight decay to every parameter by default (SGD);
    mmcv paramwise_cfg can exempt norms/embeddings. This mask decays
    everything, matching the reference's BoxInst/DiscoBox recipes."""
    return jax.tree_util.tree_map(lambda _: True, params)


def norm_and_bias_free_wd_mask(params):
    """No decay on biases / norm scales / embeddings (AdamW recipes)."""
    def pred(path, leaf):
        lowered = path.lower()
        if lowered.endswith('/bias') or leaf.ndim <= 1:
            return False
        if any(k in lowered for k in ('norm', 'bn', 'embed', 'query',
                                      'level_enc', 'pos_enc')):
            return False
        return True
    return _mask_from_predicate(params, pred)


def build_optimizer(optimizer_cfg: dict,
                    lr_schedule,
                    optimizer_config: Optional[dict] = None,
                    params_example=None,
                    paramwise_lr_fn: Optional[Callable[[str], float]] = None
                    ) -> optax.GradientTransformation:
    """Build an optax chain from mmcv-style dicts.

    Args:
      optimizer_cfg: e.g. dict(type='SGD', lr=.005, momentum=.9,
        weight_decay=1e-4) or dict(type='AdamW', ...).
      lr_schedule: lr(step) callable (absolute LR).
      optimizer_config: e.g. dict(grad_clip=dict(max_norm=35, norm_type=2)).
      paramwise_lr_fn: optional path -> multiplier for per-param LR.
    """
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop('type', 'SGD')
    cfg.pop('lr', None)
    wd = cfg.pop('weight_decay', 0.0)
    chain = []

    grad_clip = (optimizer_config or {}).get('grad_clip')
    if grad_clip:
        chain.append(optax.clip_by_global_norm(float(grad_clip['max_norm'])))

    if opt_type == 'SGD':
        momentum = cfg.pop('momentum', 0.0)
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        if momentum:
            chain.append(optax.trace(decay=momentum,
                                     nesterov=cfg.pop('nesterov', False)))
    elif opt_type == 'AdamW':
        betas = cfg.pop('betas', (0.9, 0.999))
        eps = cfg.pop('eps', 1e-8)
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if wd:
            mask = None
            if params_example is not None:
                mask = norm_and_bias_free_wd_mask(params_example)
            chain.append(optax.add_decayed_weights(wd, mask=mask))
    else:
        raise ValueError(f'unsupported optimizer {opt_type}')

    if paramwise_lr_fn is not None and params_example is not None:
        mults = jax.tree_util.tree_map_with_path(
            lambda path, _: paramwise_lr_fn(_path_str(path)), params_example)
        chain.append(_scale_by_tree(mults))
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*chain)


def _scale_by_tree(mults):
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        scaled = jax.tree_util.tree_map(lambda u, m: u * m, updates, mults)
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)
