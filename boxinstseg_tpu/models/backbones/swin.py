"""Swin Transformer backbone (reference: mmdet/models/backbones/swin.py,
763 LoC), flax/NHWC re-implementation.

Window attention is computed as dense batched matmuls over
(num_windows*B, window^2, C) blocks — MXU-shaped — with the standard
relative-position bias table and shifted-window attention masks. Static
canvas sizes make all padding/window counts compile-time constants.
Stochastic depth is only active when a 'dropout' PRNG is provided.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import Dense, compute_dtype, LayerNorm
import numpy as np

from ...registry import BACKBONES


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing='ij'))            # 2, ws, ws
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]                # 2, n, n
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return (rel[:, :, 0] + rel[:, :, 1])                     # n, n


class WindowAttention(nn.Module):
    """Window MSA with relative-position bias.

    On TPU the logits->bias->shift-mask->softmax->value chain runs as
    the fused VMEM-resident kernel in ``ops/swin_attention.py`` (the
    XLA path materializes the (nW*B, H, N, N) logit tensor in HBM three
    times — 71-241 MB per Swin-L block; the bias add alone profiled at
    16 ms/step). ``regions`` are the (nW, N) int32 shift-partition ids;
    the additive mask of the XLA fallback is derived from them
    (reference mmdet/models/backbones/swin.py:242 builds its mask from
    the same cyclic-shift region image)."""
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, regions=None):
        """x: (nW*B, N, C); regions: (nW, N) int32 ids or None."""
        ws = self.window_size
        n = ws * ws
        h = self.num_heads
        d = self.dim // h
        bias_table = self.param(
            'relative_position_bias_table',
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), h))
        rel_idx = jnp.asarray(_rel_pos_index(ws))
        qkv = Dense(self.dim * 3, use_bias=self.qkv_bias,
                       name='qkv')(x)
        bw = x.shape[0]
        bias = bias_table[rel_idx.reshape(-1)].reshape(n, n, h)

        from ...ops.swin_attention import flash_ok, window_attention
        nw = regions.shape[0] if regions is not None else 0
        if regions is not None and flash_ok(bw, nw, n, d, h):
            # q/k/v are pure LANE slices of the fused qkv output — no
            # head-axis reshape/transpose anywhere on the flash path
            out = window_attention(
                qkv[..., :self.dim].astype(compute_dtype()),
                qkv[..., self.dim:2 * self.dim].astype(compute_dtype()),
                qkv[..., 2 * self.dim:].astype(compute_dtype()),
                bias.transpose(2, 0, 1).astype(jnp.float32),
                jnp.asarray(regions), float(d ** -0.5))
            return Dense(self.dim, name='proj')(out)

        qkv = qkv.reshape(bw, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum('bhnd,bhmd->bhnm', q, k,
                          preferred_element_type=jnp.float32) * (d ** -0.5)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if regions is not None and regions.any():
            r2 = jnp.asarray(regions)[:, 0]              # (nW, N)
            mask = jnp.where(r2[:, None, :] != r2[:, :, None],
                             -100.0, 0.0)
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, h, n, n) + \
                mask[None, :, None]
            attn = attn.reshape(bw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, self.dim)
        return Dense(self.dim, name='proj')(out)


def _window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(wins, ws, h, w):
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _shift_attn_mask(h, w, ws, shift):
    """(nW, N, N) additive mask for SW-MSA, derived from the region ids
    (kept for tests/oracles; the model passes region ids directly)."""
    from ...ops.swin_attention import shift_regions
    r = shift_regions(h, w, ws, shift)[:, 0]
    return jnp.where(r[:, None, :] != r[:, :, None], -100.0, 0.0)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws == self.window_size else 0

        shortcut = x
        x = LayerNorm(name='norm1')(x)
        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        from ...ops.swin_attention import shift_regions
        regions = shift_regions(hp, wp, ws, shift)   # static numpy
        wins = _window_partition(x, ws)
        wins = WindowAttention(self.dim, self.num_heads, ws,
                               self.qkv_bias, name='attn')(wins, regions)
        x = _window_reverse(wins, ws, hp, wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w]
        x = shortcut + self._drop_path(x, train)

        y = LayerNorm(name='norm2')(x)
        y = Dense(int(self.dim * self.mlp_ratio), name='mlp_fc1')(y)
        y = jax.nn.gelu(y, approximate=False)
        y = Dense(self.dim, name='mlp_fc2')(y)
        return x + self._drop_path(y, train)

    def _drop_path(self, x, train):
        if self.drop_path == 0.0 or not train \
                or not self.has_rng('dropout'):
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng('dropout')
        mask = jax.random.bernoulli(rng, keep,
                                    (x.shape[0], 1, 1, 1)).astype(x.dtype)
        return x * mask / keep


@BACKBONES.register_module()
class SwinTransformer(nn.Module):
    pretrain_img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    embed_dims: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.3
    patch_norm: bool = True
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    with_cp: bool = False
    convert_weights: bool = True
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # patch embed: 4x4 conv stride 4 + LN
        x = nn.Conv(self.embed_dims, (self.patch_size, self.patch_size),
                    dtype=compute_dtype(), param_dtype=jnp.float32,
                    strides=(self.patch_size, self.patch_size),
                    name='patch_embed')(x)
        if self.patch_norm:
            x = LayerNorm(name='patch_norm')(x)

        total_blocks = sum(self.depths)
        dprs = np.linspace(0, self.drop_path_rate, total_blocks)
        outs = []
        blk = 0
        dim = self.embed_dims
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                x = SwinBlock(
                    dim=dim, num_heads=self.num_heads[si],
                    window_size=self.window_size,
                    shift=0 if bi % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    drop_path=float(dprs[blk]),
                    name=f'stage{si}_block{bi}')(x, train=train)
                blk += 1
            if si <= self.frozen_stages - 1:
                x = jax.lax.stop_gradient(x)
            if si in self.out_indices:
                out = LayerNorm(name=f'out_norm{si}')(x)
                outs.append(out)
            if si < len(self.depths) - 1:
                # patch merging: 2x2 concat -> LN -> Dense(2C)
                b, h, w, c = x.shape
                ph, pw = h % 2, w % 2
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                x = jnp.concatenate([
                    x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                    x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
                x = LayerNorm(name=f'merge_norm{si}')(x)
                x = Dense(2 * c, use_bias=False,
                             name=f'merge_reduction{si}')(x)
                dim = 2 * c
        return tuple(outs)
