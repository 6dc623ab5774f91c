"""Torch checkpoint converters.

Maps torchvision ResNet weights and reference-trained CondInst/BoxInst
checkpoints (torch state_dicts) into this toolbox's flax param/batch_stats
pytrees, for pretrained init and AP-parity evaluation (reference pattern:
mmdet/models/utils/ckpt_convert.py). torch (CPU) is only needed at
conversion time, never in the training/inference path.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _conv_w(w) -> np.ndarray:
    """torch conv weight (O, I, H, W) -> flax (H, W, I, O)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _to_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = value


def convert_resnet(state_dict: Dict[str, Any]
                   ) -> Tuple[Dict, Dict]:
    """torchvision/mmdet ResNet state_dict -> (params, batch_stats) trees
    matching boxinstseg_tpu.models.backbones.resnet.ResNet."""
    params: Dict = {}
    stats: Dict = {}
    for key, val in state_dict.items():
        v = _to_np(_to_np(val))
        if key.startswith('fc.'):
            continue
        m = re.match(r'^(conv1|bn1)\.(.+)$', key)
        if m:
            name, leaf = m.groups()
            _emit(params, stats, (name,), name.startswith('bn'), leaf, v)
            continue
        m = re.match(r'^layer(\d)\.(\d+)\.(conv|bn)(\d)\.(.+)$', key)
        if m:
            s, b, kind, i, leaf = m.groups()
            block = f'layer{s}_{b}'
            _emit(params, stats, (block, f'{kind}{i}'), kind == 'bn',
                  leaf, v)
            continue
        m = re.match(r'^layer(\d)\.(\d+)\.downsample\.(\d)\.(.+)$', key)
        if m:
            s, b, j, leaf = m.groups()
            block = f'layer{s}_{b}'
            name = 'downsample_conv' if j == '0' else 'downsample_bn'
            _emit(params, stats, (block, name), j == '1', leaf, v)
            continue
    return params, stats


def _emit(params, stats, path, is_bn, leaf, v):
    if is_bn:
        if leaf == 'weight':
            _set(params, path + ('scale',), v)
        elif leaf == 'bias':
            _set(params, path + ('bias',), v)
        elif leaf == 'running_mean':
            _set(stats, path + ('mean',), v)
        elif leaf == 'running_var':
            _set(stats, path + ('var',), v)
        # num_batches_tracked dropped
    else:
        if leaf == 'weight':
            _set(params, path + ('kernel',), _conv_w(v))
        elif leaf == 'bias':
            _set(params, path + ('bias',), v)


def load_torchvision_resnet(path: str) -> Tuple[Dict, Dict]:
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=True)
    if 'state_dict' in sd:
        sd = sd['state_dict']
    return convert_resnet(sd)


# ---- full reference CondInst checkpoints ------------------------------------

def convert_condinst_checkpoint(state_dict: Dict[str, Any],
                                stacked_convs: int = 4,
                                num_laterals: int = 3
                                ) -> Tuple[Dict, Dict]:
    """Reference CondInst/BoxInst state_dict -> (params, batch_stats)
    matching our CondInst flax module tree (submodules backbone_m, neck_m,
    bbox_head_m, mask_branch_m). Used for AP-parity evaluation of
    reference-trained weights."""
    params: Dict = {}
    stats: Dict = {}

    # 1) backbone
    bb = {k[len('backbone.'):]: v for k, v in state_dict.items()
          if k.startswith('backbone.')}
    p, s = convert_resnet(bb)
    params['backbone_m'] = p
    stats['backbone_m'] = s

    neck: Dict = {}
    head: Dict = {}
    branch: Dict = {}
    for key, val in state_dict.items():
        v = _to_np(val)
        m = re.match(r'^neck\.lateral_convs\.(\d+)\.conv\.(weight|bias)$',
                     key)
        if m:
            i, leaf = m.groups()
            _set(neck, (f'lateral_{i}',
                        'kernel' if leaf == 'weight' else 'bias'),
                 _conv_w(v) if leaf == 'weight' else v)
            continue
        m = re.match(r'^neck\.fpn_convs\.(\d+)\.conv\.(weight|bias)$', key)
        if m:
            i, leaf = m.groups()
            i = int(i)
            name = (f'fpn_conv_{i}' if i < num_laterals
                    else f'extra_conv_{i - num_laterals}')
            _set(neck, (name,
                        'kernel' if leaf == 'weight' else 'bias'),
                 _conv_w(v) if leaf == 'weight' else v)
            continue
        # bbox head towers: cls_convs/reg_convs i -> {cls,reg}_tower_i
        m = re.match(r'^bbox_head\.(cls|reg)_convs\.(\d+)\.'
                     r'(conv|gn)\.(.+)$', key)
        if m:
            kind, i, sub, leaf = m.groups()
            tower = f'{kind}_tower_{i}'
            if sub == 'conv':
                _set(head, (tower, 'conv',
                            'kernel' if leaf == 'weight' else 'bias'),
                     _conv_w(v) if leaf == 'weight' else v)
            else:  # GroupNorm
                _set(head, (tower, 'gn',
                            'scale' if leaf == 'weight' else 'bias'), v)
            continue
        m = re.match(r'^bbox_head\.(conv_cls|conv_reg|conv_centerness)\.'
                     r'(weight|bias)$', key)
        if m:
            name, leaf = m.groups()
            _set(head, (name,
                        'kernel' if leaf == 'weight' else 'bias'),
                 _conv_w(v) if leaf == 'weight' else v)
            continue
        m = re.match(r'^bbox_head\.scales\.(\d+)\.scale$', key)
        if m:
            _set(head, (f'scale_{m.group(1)}', 'scale'),
                 np.asarray(v).reshape(()))
            continue
        if key.startswith('mask_head.param_conv.'):
            leaf = key.rsplit('.', 1)[-1]
            _set(head, ('param_conv',
                        'kernel' if leaf == 'weight' else 'bias'),
                 _conv_w(v) if leaf == 'weight' else v)
            continue
        # mask branch: refines.i / mask_branch.j (ConvModule conv+bn) and
        # final 1x1 conv (index branch_convs in the torch Sequential)
        branch_stats = stats.setdefault('mask_branch_m', {})
        m = re.match(r'^mask_branch\.refines\.(\d+)\.'
                     r'(conv|bn)\.(.+)$', key)
        if m:
            i, sub, leaf = m.groups()
            _emit_convmodule(branch, branch_stats, f'refine_{i}', sub,
                             leaf, v)
            continue
        m = re.match(r'^mask_branch\.mask_branch\.(\d+)\.'
                     r'(conv|bn)\.(.+)$', key)
        if m:
            i, sub, leaf = m.groups()
            _emit_convmodule(branch, branch_stats, f'branch_{i}', sub,
                             leaf, v)
            continue
        m = re.match(r'^mask_branch\.mask_branch\.(\d+)\.(weight|bias)$',
                     key)
        if m:  # trailing plain conv
            leaf = m.group(2)
            _set(branch, ('branch_out',
                          'kernel' if leaf == 'weight' else 'bias'),
                 _conv_w(v) if leaf == 'weight' else v)
            continue
    params['neck_m'] = neck
    params['bbox_head_m'] = head
    params['mask_branch_m'] = branch
    return params, stats


def _emit_convmodule(params, stats, name, sub, leaf, v):
    if sub == 'conv':
        _set(params, (name, 'conv',
                      'kernel' if leaf == 'weight' else 'bias'),
             _conv_w(v) if leaf == 'weight' else v)
    else:  # BN
        if leaf == 'weight':
            _set(params, (name, 'bn', 'scale'), v)
        elif leaf == 'bias':
            _set(params, (name, 'bn', 'bias'), v)
        elif leaf == 'running_mean':
            _set(stats, (name, 'bn', 'mean'), v)
        elif leaf == 'running_var':
            _set(stats, (name, 'bn', 'var'), v)
