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


# ---- Swin Transformer --------------------------------------------------------

def _linear_w(w) -> np.ndarray:
    """torch Linear weight (out, in) -> flax kernel (in, out)."""
    return np.ascontiguousarray(np.asarray(w).T)


def _merge_perm(c: int) -> np.ndarray:
    """Input-channel permutation mapping mmcv PatchMerging's unfold layout
    to our block-major 2x2 concat.

    mmcv PatchMerging (reference swin.py downsample) uses nn.Unfold: input
    index = c*4 + (ky*2 + kx), positions ordered (0,0),(0,1),(1,0),(1,1).
    Ours concatenates [x(0,0)|x(1,0)|x(0,1)|x(1,1)] channel blocks. (The
    official Swin repo uses yet another order — mmdet's swin_converter
    `correct_unfold_reduction_order` handles that side; here we convert
    from the *mmdet* layout, which is what reference-trained checkpoints
    use.)
    """
    kmap = [0, 2, 1, 3]   # our block r -> mmcv unfold position index
    return np.asarray([ch * 4 + kmap[r] for r in range(4)
                       for ch in range(c)], np.int64)


def convert_swin(state_dict: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """mmdet SwinTransformer state_dict (reference
    mmdet/models/backbones/swin.py module naming) -> our flax param tree
    (models/backbones/swin.py). Returns (params, {}) — Swin has no
    batch-norm statistics."""
    params: Dict = {}
    for key, val in state_dict.items():
        v = _to_np(val)
        if key.endswith('relative_position_index') or \
                key.endswith('attn_mask') or 'absolute_pos_embed' in key:
            continue
        if key == 'patch_embed.projection.weight':
            _set(params, ('patch_embed', 'kernel'), _conv_w(v))
        elif key == 'patch_embed.projection.bias':
            _set(params, ('patch_embed', 'bias'), v)
        elif key.startswith('patch_embed.norm.'):
            leaf = 'scale' if key.endswith('weight') else 'bias'
            _set(params, ('patch_norm', leaf), v)
            continue
        m = re.match(r'^stages\.(\d+)\.blocks\.(\d+)\.(.+)$', key)
        if m:
            si, bi, rest = m.groups()
            blk = f'stage{si}_block{bi}'
            if rest.startswith('norm'):
                which, leaf = rest.split('.')
                _set(params, (blk, which,
                              'scale' if leaf == 'weight' else 'bias'), v)
            elif rest == 'attn.w_msa.relative_position_bias_table':
                _set(params, (blk, 'attn', 'relative_position_bias_table'),
                     v)
            elif rest.startswith('attn.w_msa.qkv.'):
                leaf = rest.rsplit('.', 1)[-1]
                _set(params, (blk, 'attn', 'qkv',
                              'kernel' if leaf == 'weight' else 'bias'),
                     _linear_w(v) if leaf == 'weight' else v)
            elif rest.startswith('attn.w_msa.proj.'):
                leaf = rest.rsplit('.', 1)[-1]
                _set(params, (blk, 'attn', 'proj',
                              'kernel' if leaf == 'weight' else 'bias'),
                     _linear_w(v) if leaf == 'weight' else v)
            elif rest.startswith('ffn.layers.0.0.'):
                leaf = rest.rsplit('.', 1)[-1]
                _set(params, (blk, 'mlp_fc1',
                              'kernel' if leaf == 'weight' else 'bias'),
                     _linear_w(v) if leaf == 'weight' else v)
            elif rest.startswith('ffn.layers.1.'):
                leaf = rest.rsplit('.', 1)[-1]
                _set(params, (blk, 'mlp_fc2',
                              'kernel' if leaf == 'weight' else 'bias'),
                     _linear_w(v) if leaf == 'weight' else v)
            continue
        m = re.match(r'^stages\.(\d+)\.downsample\.(norm|reduction)\.(.+)$',
                     key)
        if m:
            si, which, leaf = m.groups()
            c = v.shape[-1] // 4 if which == 'reduction' else v.shape[0] // 4
            perm = _merge_perm(c)
            if which == 'norm':
                _set(params, (f'merge_norm{si}',
                              'scale' if leaf == 'weight' else 'bias'),
                     v[perm])
            else:
                _set(params, (f'merge_reduction{si}', 'kernel'),
                     _linear_w(v)[perm])
            continue
        m = re.match(r'^norm(\d+)\.(weight|bias)$', key)
        if m:
            si, leaf = m.groups()
            _set(params, (f'out_norm{si}',
                          'scale' if leaf == 'weight' else 'bias'), v)
    return params, {}


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
    elif sub == 'gn':
        _set(params, (name, 'gn',
                      'scale' if leaf == 'weight' else 'bias'), v)
    else:  # BN
        if leaf == 'weight':
            _set(params, (name, 'bn', 'scale'), v)
        elif leaf == 'bias':
            _set(params, (name, 'bn', 'bias'), v)
        elif leaf == 'running_mean':
            _set(stats, (name, 'bn', 'mean'), v)
        elif leaf == 'running_var':
            _set(stats, (name, 'bn', 'var'), v)


# ---- shared sub-converters ---------------------------------------------------

def convert_backbone(state_dict: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Dispatch on key pattern: mmdet ResNet vs SwinTransformer."""
    if any(k.startswith('stages.') for k in state_dict):
        return convert_swin(state_dict)
    return convert_resnet(state_dict)


def convert_fpn(state_dict: Dict[str, Any]) -> Dict:
    """mmdet FPN state_dict (keys under neck.) -> our FPN tree. Handles both
    layouts: P3-P7 with extra convs (BoxInst) and P2-P6 with maxpool extra
    (SOLO-style — fpn_convs count == lateral count)."""
    num_laterals = len({k.split('.')[1] for k in state_dict
                        if k.startswith('lateral_convs.')})
    neck: Dict = {}
    for key, val in state_dict.items():
        v = _to_np(val)
        m = re.match(r'^lateral_convs\.(\d+)\.conv\.(weight|bias)$', key)
        if m:
            i, leaf = m.groups()
            _set(neck, (f'lateral_{i}',
                        'kernel' if leaf == 'weight' else 'bias'),
                 _conv_w(v) if leaf == 'weight' else v)
            continue
        m = re.match(r'^fpn_convs\.(\d+)\.conv\.(weight|bias)$', key)
        if m:
            i, leaf = m.groups()
            i = int(i)
            name = (f'fpn_conv_{i}' if i < num_laterals
                    else f'extra_conv_{i - num_laterals}')
            _set(neck, (name, 'kernel' if leaf == 'weight' else 'bias'),
                 _conv_w(v) if leaf == 'weight' else v)
    return neck


def _convert_convmodule_list(state_dict: Dict[str, Any], prefix: str,
                             rename) -> Tuple[Dict, Dict]:
    """Map ``{prefix}.{i}.{conv,gn,bn}.{leaf}`` entries through ``rename(i)``."""
    params: Dict = {}
    stats: Dict = {}
    pat = re.compile(rf'^{re.escape(prefix)}\.(\d+)\.(conv|gn|bn)\.(.+)$')
    for key, val in state_dict.items():
        m = pat.match(key)
        if m:
            i, sub, leaf = m.groups()
            _emit_convmodule(params, stats, rename(int(i)), sub, leaf,
                             _to_np(val))
    return params, stats


def _plain_conv(params, name, leaf, v):
    _set(params, (name, 'kernel' if leaf == 'weight' else 'bias'),
         _conv_w(v) if leaf == 'weight' else v)


# ---- SOLO-family heads (BoxLevelset / DiscoBox) -------------------------------

def convert_box_solov2_head(state_dict: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Reference BoxSOLOv2Head (box_solov2_head.py:62-157) -> our
    BoxSOLOv2Head tree (kernel_conv_i/cate_conv_i ConvModules,
    feature_conv_i_j unified mask feature, solo_* predictors)."""
    params: Dict = {}
    stats: Dict = {}
    for prefix, rename in [('kernel_convs', lambda i: f'kernel_conv_{i}'),
                           ('cate_convs', lambda i: f'cate_conv_{i}')]:
        sub = {k: v for k, v in state_dict.items() if k.startswith(prefix)}
        p, s = _convert_convmodule_list(sub, prefix, rename)
        params.update(p)
        _merge(stats, s)
    for key, val in state_dict.items():
        v = _to_np(val)
        m = re.match(r'^feature_convs\.(\d+)\.conv(\d+)\.(conv|gn|bn)\.(.+)$',
                     key)
        if m:
            i, j, sub, leaf = m.groups()
            _emit_convmodule(params, stats, f'feature_conv_{i}_{j}', sub,
                             leaf, v)
            continue
        m = re.match(r'^(solo_cate|solo_kernel|solo_mask|levelset_bottom)\.'
                     r'(weight|bias)$', key)
        if m:
            _plain_conv(params, m.group(1), m.group(2), v)
    return params, stats


def convert_discobox_head(state_dict: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Reference DiscoBoxSOLOv2Head (discobox_head.py:761-797)."""
    params: Dict = {}
    stats: Dict = {}
    for prefix, rename in [('kernel_convs', lambda i: f'kernel_conv_{i}'),
                           ('cate_convs', lambda i: f'cate_conv_{i}')]:
        sub = {k: v for k, v in state_dict.items() if k.startswith(prefix)}
        p, s = _convert_convmodule_list(sub, prefix, rename)
        params.update(p)
        _merge(stats, s)
    for key, val in state_dict.items():
        m = re.match(r'^(solo_cate|solo_kernel)\.(weight|bias)$', key)
        if m:
            _plain_conv(params, m.group(1), m.group(2), _to_np(val))
    return params, stats


def convert_discobox_mask_feat_head(state_dict: Dict[str, Any]
                                    ) -> Tuple[Dict, Dict]:
    """Reference DiscoBoxMaskFeatHead (discobox_head.py:436-498):
    convs_all_levels.i.convj -> level_i_conv_j; conv_pred.0 -> conv_pred."""
    params: Dict = {}
    stats: Dict = {}
    for key, val in state_dict.items():
        v = _to_np(val)
        m = re.match(r'^convs_all_levels\.(\d+)\.conv(\d+)\.'
                     r'(conv|gn|bn)\.(.+)$', key)
        if m:
            i, j, sub, leaf = m.groups()
            _emit_convmodule(params, stats, f'level_{i}_conv_{j}', sub,
                             leaf, v)
            continue
        m = re.match(r'^conv_pred\.0\.(conv|gn|bn)\.(.+)$', key)
        if m:
            sub, leaf = m.groups()
            _emit_convmodule(params, stats, 'conv_pred', sub, leaf, v)
    return params, stats


# ---- Box2Mask head -------------------------------------------------------------

def _linear(params, path, leaf, v):
    _set(params, path + ('kernel' if leaf == 'weight' else 'bias',),
         _linear_w(v) if leaf == 'weight' else v)


def _mha(params, path, key_rest, v):
    """mmcv MultiheadAttention (torch nn.MultiheadAttention inside .attn):
    in_proj qkv rows split into q_proj/k_proj/v_proj, out_proj direct."""
    if key_rest == 'attn.in_proj_weight':
        c = v.shape[0] // 3
        for i, name in enumerate(('q_proj', 'k_proj', 'v_proj')):
            _set(params, path + (name, 'kernel'),
                 _linear_w(v[i * c:(i + 1) * c]))
    elif key_rest == 'attn.in_proj_bias':
        c = v.shape[0] // 3
        for i, name in enumerate(('q_proj', 'k_proj', 'v_proj')):
            _set(params, path + (name, 'bias'), v[i * c:(i + 1) * c])
    elif key_rest == 'attn.out_proj.weight':
        _set(params, path + ('out_proj', 'kernel'), _linear_w(v))
    elif key_rest == 'attn.out_proj.bias':
        _set(params, path + ('out_proj', 'bias'), v)


def convert_box2mask_head(state_dict: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Reference Box2MaskHead (box2mask_head.py:62-105) -> our tree.

    Covers: MSDeformAttnPixelDecoder (input convs + 6 encoder layers +
    FPN top-down + mask_feature + level_encoding), 9-layer masked-attention
    decoder (mmcv MultiheadAttention in_proj split), query/level embeddings,
    cls/mask embeds, levelset_bottom.
    """
    params: Dict = {}
    stats: Dict = {}
    pd: Dict = params.setdefault('pixel_decoder', {})
    for key, val in state_dict.items():
        v = _to_np(val)
        # ---------------- pixel decoder
        m = re.match(r'^pixel_decoder\.input_convs\.(\d+)\.'
                     r'(conv|gn|bn)\.(.+)$', key)
        if m:
            i, sub, leaf = m.groups()
            _emit_convmodule(pd, stats, f'input_conv_{i}', sub, leaf, v)
            continue
        m = re.match(r'^pixel_decoder\.(lateral_convs|output_convs)\.(\d+)\.'
                     r'(conv|gn|bn)\.(.+)$', key)
        if m:
            which, i, sub, leaf = m.groups()
            name = ('lateral_conv_' if which == 'lateral_convs'
                    else 'output_conv_') + i
            _emit_convmodule(pd, stats, name, sub, leaf, v)
            continue
        if key == 'pixel_decoder.level_encoding.weight':
            _set(pd, ('level_encoding',), v)
            continue
        m = re.match(r'^pixel_decoder\.mask_feature\.(weight|bias)$', key)
        if m:
            _plain_conv(pd, 'mask_feature', m.group(1), v)
            continue
        m = re.match(r'^pixel_decoder\.encoder\.layers\.(\d+)\.(.+)$', key)
        if m:
            li, rest = m.groups()
            base = (f'encoder_layer_{li}',)
            m2 = re.match(r'^attentions\.0\.(sampling_offsets|'
                          r'attention_weights|value_proj|output_proj)\.'
                          r'(weight|bias)$', rest)
            if m2:
                _linear(pd, base + ('attn', m2.group(1)), m2.group(2), v)
                continue
            m2 = re.match(r'^ffns\.0\.layers\.0\.0\.(weight|bias)$', rest)
            if m2:
                _linear(pd, base + ('ffn', 'fc1'), m2.group(1), v)
                continue
            m2 = re.match(r'^ffns\.0\.layers\.1\.(weight|bias)$', rest)
            if m2:
                _linear(pd, base + ('ffn', 'fc2'), m2.group(1), v)
                continue
            m2 = re.match(r'^norms\.(\d)\.(weight|bias)$', rest)
            if m2:
                i, leaf = m2.groups()
                _set(pd, base + (f'norm{int(i) + 1}',
                                 'scale' if leaf == 'weight' else 'bias'), v)
            continue
        # ---------------- transformer decoder
        m = re.match(r'^transformer_decoder\.layers\.(\d+)\.(.+)$', key)
        if m:
            li, rest = m.groups()
            base = (f'decoder_layer_{li}',)
            # operation order: attentions.0 = cross, attentions.1 = self
            m2 = re.match(r'^attentions\.([01])\.(attn\..+)$', rest)
            if m2:
                which = 'cross_attn' if m2.group(1) == '0' else 'self_attn'
                _mha(params, base + (which,), m2.group(2), v)
                continue
            m2 = re.match(r'^ffns\.0\.layers\.0\.0\.(weight|bias)$', rest)
            if m2:
                _linear(params, base + ('ffn', 'fc1'), m2.group(1), v)
                continue
            m2 = re.match(r'^ffns\.0\.layers\.1\.(weight|bias)$', rest)
            if m2:
                _linear(params, base + ('ffn', 'fc2'), m2.group(1), v)
                continue
            m2 = re.match(r'^norms\.(\d)\.(weight|bias)$', rest)
            if m2:
                i, leaf = m2.groups()
                _set(params, base + (f'norm{int(i) + 1}',
                                     'scale' if leaf == 'weight' else 'bias'),
                     v)
            continue
        m = re.match(r'^transformer_decoder\.post_norm\.(weight|bias)$', key)
        if m:
            _set(params, ('post_norm',
                          'scale' if m.group(1) == 'weight' else 'bias'), v)
            continue
        # ---------------- embeddings + predictors
        m = re.match(r'^(query_embed|query_feat|level_embed)\.weight$', key)
        if m:
            _set(params, (m.group(1),), v)
            continue
        m = re.match(r'^cls_embed\.(weight|bias)$', key)
        if m:
            _linear(params, ('cls_embed',), m.group(1), v)
            continue
        m = re.match(r'^mask_embed\.([024])\.(weight|bias)$', key)
        if m:
            idx = {'0': 'mask_embed_0', '2': 'mask_embed_1',
                   '4': 'mask_embed_out'}[m.group(1)]
            _linear(params, (idx,), m.group(2), v)
            continue
        m = re.match(r'^levelset_bottom\.(weight|bias)$', key)
        if m:
            _plain_conv(params, 'levelset_bottom', m.group(1), v)
    return params, stats


def _merge(dst: Dict, src: Dict):
    for k, v in src.items():
        if isinstance(v, dict):
            _merge(dst.setdefault(k, {}), v)
        else:
            dst[k] = v


# ---- whole-checkpoint dispatcher ----------------------------------------------

def convert_reference_checkpoint(state_dict: Dict[str, Any]
                                 ) -> Tuple[Dict, Dict]:
    """Any reference-trained checkpoint -> (params, batch_stats) for the
    matching detector in this toolbox. Dispatches on key patterns:
    panoptic_head -> Box2Mask; mask_feat_head -> DiscoBox (teacher.* keys
    of the momentum teacher are skipped — eval uses the student);
    mask_branch -> CondInst/BoxInst; else SOLO-style BoxLevelset."""
    keys = list(state_dict)
    if any(k.startswith('mask_branch.') for k in keys):
        return convert_condinst_checkpoint(state_dict)

    params: Dict = {}
    stats: Dict = {}
    bb = {k[len('backbone.'):]: v for k, v in state_dict.items()
          if k.startswith('backbone.')}
    params['backbone_m'], stats['backbone_m'] = convert_backbone(bb)
    if any(k.startswith('neck.') for k in keys):
        params['neck_m'] = convert_fpn(
            {k[len('neck.'):]: v for k, v in state_dict.items()
             if k.startswith('neck.')})

    if any(k.startswith('panoptic_head.') for k in keys):
        hd = {k[len('panoptic_head.'):]: v for k, v in state_dict.items()
              if k.startswith('panoptic_head.')}
        p, s = convert_box2mask_head(hd)
        params['panoptic_head_m'] = p
        if s:
            stats['panoptic_head_m'] = s
        return params, stats

    hd = {k[len('bbox_head.'):]: v for k, v in state_dict.items()
          if k.startswith('bbox_head.')}
    if any(k.startswith('mask_feat_head.') for k in keys):
        p, s = convert_discobox_head(hd)
        params['bbox_head_m'] = p
        if s:
            stats['bbox_head_m'] = s
        mf = {k[len('mask_feat_head.'):]: v for k, v in state_dict.items()
              if k.startswith('mask_feat_head.')}
        p, s = convert_discobox_mask_feat_head(mf)
        params['mask_feat_head_m'] = p
        if s:
            stats['mask_feat_head_m'] = s
    else:
        p, s = convert_box_solov2_head(hd)
        params['bbox_head_m'] = p
        if s:
            stats['bbox_head_m'] = s
    return params, stats
