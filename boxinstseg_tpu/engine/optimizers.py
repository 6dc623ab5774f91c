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


_SWIN_KEY_SUBS = (
    # mmdet Swin module paths -> this repo's flax param paths (the Swin
    # recipes' custom_keys name backbone norms/embeddings explicitly;
    # without these translations they silently matched nothing and the
    # reference's decay_mult=0.0 never applied)
    (r'^backbone\.stages\.(\d+)\.blocks\.(\d+)\.norm',
     r'backbone_m/stage\1_block\2/norm'),
    (r'^backbone\.stages\.(\d+)\.downsample\.norm',
     r'backbone_m/merge_norm\1'),
    (r'^backbone\.patch_embed\.norm$', 'backbone_m/patch_norm'),
    (r'^backbone\.norm', 'backbone_m/out_norm'),
)


def _ref_key_to_path(key: str) -> str:
    """Reference param-name prefixes -> our path substrings."""
    k = key.lower()
    for pat, rep in _SWIN_KEY_SUBS:
        if re.match(pat, k):
            return re.sub(pat, rep, k)
    return k.replace('backbone', 'backbone_m').replace('.', '/')


def _is_norm_param(path: str, leaf) -> bool:
    lowered = path.lower()
    return (('norm' in lowered or '/bn/' in lowered or '/gn/' in lowered
             or lowered.endswith('/scale'))
            and getattr(leaf, 'ndim', 2) <= 1)


def paramwise_fns(optimizer_cfg: dict):
    """mmcv DefaultOptimizerConstructor paramwise_cfg semantics:
    custom_keys {prefix: dict(lr_mult, decay_mult)} with longest-prefix
    match, plus norm_decay_mult (reference: Box2Mask AdamW recipe —
    backbone lr x0.1, embeddings decay 0, norm_decay_mult 0).

    With constructor='LayerDecayOptimizerConstructor' the lr multiplier is
    layer_decay_rate^(num_layers+1-layer_id) over backbone blocks
    (reference: mmdet/core/optimizers/layer_decay_optimizer_constructor).
    Returns (lr_mult(path), wd_mult(path, leaf)).
    """
    pw = dict(optimizer_cfg.get('paramwise_cfg', {}) or {})
    custom = pw.get('custom_keys', {}) or {}
    keys = sorted(((k, v) for k, v in custom.items()),
                  key=lambda kv: -len(kv[0]))
    norm_decay = pw.get('norm_decay_mult')
    layer_decay = optimizer_cfg.get('constructor') == \
        'LayerDecayOptimizerConstructor'
    num_layers = pw.get('num_layers', 12)
    decay_rate = pw.get('layer_decay_rate', pw.get('decay_rate', 0.9))

    def _layer_id(path: str) -> Optional[int]:
        """Backbone depth index for our ResNet/Swin path names."""
        if 'backbone_m' not in path:
            return None
        m = re.search(r'patch_embed|conv1|bn1', path)
        if m:
            return 0
        m = re.search(r'stage(\d+)_block(\d+)', path)
        if m:
            # swin: running block index (depths capped at num_layers)
            si, bi = int(m.group(1)), int(m.group(2))
            return min(si * 2 + bi + 1, num_layers)
        m = re.search(r'layer(\d)_(\d+)', path)
        if m:
            return min((int(m.group(1)) - 1) * 2 + int(m.group(2)) + 1,
                       num_layers)
        return num_layers  # merge norms / out norms

    def lr_mult(path: str) -> float:
        lowered = path.lower()
        mult = 1.0
        for key, spec in keys:
            if _ref_key_to_path(key) in lowered:
                mult = float(spec.get('lr_mult', 1.0))
                break
        if layer_decay:
            lid = _layer_id(lowered)
            if lid is not None:
                mult *= float(decay_rate) ** (num_layers + 1 - lid)
        return mult

    def wd_mult(path: str, leaf) -> float:
        lowered = path.lower()
        for key, spec in keys:
            if _ref_key_to_path(key) in lowered and 'decay_mult' in spec:
                return float(spec['decay_mult'])
        if norm_decay is not None and _is_norm_param(lowered, leaf):
            return float(norm_decay)
        return 1.0

    return lr_mult, wd_mult


def build_optimizer(optimizer_cfg: dict,
                    lr_schedule,
                    optimizer_config: Optional[dict] = None,
                    params_example=None,
                    paramwise_lr_fn: Optional[Callable[[str], float]] = None
                    ) -> optax.GradientTransformation:
    """Build an optax chain from mmcv-style dicts.

    Args:
      optimizer_cfg: e.g. dict(type='SGD', lr=.005, momentum=.9,
        weight_decay=1e-4, paramwise_cfg=..., constructor=...).
      lr_schedule: lr(step) callable (absolute LR).
      optimizer_config: e.g. dict(grad_clip=dict(max_norm=35, norm_type=2)).
      paramwise_lr_fn: optional extra path -> LR multiplier (composed with
        paramwise_cfg's own lr_mult/layer-decay rules).
    """
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop('type', 'SGD')
    cfg.pop('lr', None)
    wd = cfg.pop('weight_decay', 0.0)
    chain = []

    lr_mult_fn, wd_mult_fn = paramwise_fns(optimizer_cfg)
    has_paramwise = bool(optimizer_cfg.get('paramwise_cfg')) or \
        optimizer_cfg.get('constructor')

    def wd_transform():
        """Per-parameter decay multipliers (torch default: decay ALL)."""
        if params_example is None or not has_paramwise:
            return optax.add_decayed_weights(wd)
        mults = jax.tree_util.tree_map_with_path(
            lambda path, leaf: wd * wd_mult_fn(_path_str(path), leaf),
            params_example)
        return optax.GradientTransformation(
            lambda params: optax.EmptyState(),
            lambda updates, state, params=None: (
                jax.tree_util.tree_map(
                    lambda u, p, m: u + m * p, updates, params, mults),
                state))

    grad_clip = (optimizer_config or {}).get('grad_clip')
    if grad_clip:
        chain.append(optax.clip_by_global_norm(float(grad_clip['max_norm'])))

    if opt_type == 'SGD':
        momentum = cfg.pop('momentum', 0.0)
        if wd:
            chain.append(wd_transform())
        if momentum:
            chain.append(optax.trace(decay=momentum,
                                     nesterov=cfg.pop('nesterov', False)))
    elif opt_type == 'AdamW':
        betas = cfg.pop('betas', (0.9, 0.999))
        eps = cfg.pop('eps', 1e-8)
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if wd:
            chain.append(wd_transform())
    else:
        raise ValueError(f'unsupported optimizer {opt_type}')

    if params_example is not None:
        def total_mult(path):
            m = lr_mult_fn(path)
            if paramwise_lr_fn is not None:
                m *= paramwise_lr_fn(path)
            return m
        mults = jax.tree_util.tree_map_with_path(
            lambda path, _: total_mult(_path_str(path)), params_example)
        if any(m != 1.0 for m in jax.tree_util.tree_leaves(mults)):
            chain.append(_scale_by_tree(mults))
    elif paramwise_lr_fn is not None:
        raise ValueError('paramwise LR requires params_example')
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*chain)


def _scale_by_tree(mults):
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        scaled = jax.tree_util.tree_map(lambda u, m: u * m, updates, mults)
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)
