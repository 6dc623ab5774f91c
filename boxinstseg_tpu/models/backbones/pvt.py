"""Pyramid Vision Transformer backbone (reference:
mmdet/models/backbones/pvt.py, 591 LoC — PVT v1 and v2), flax/NHWC.

Four stages of (patch embed -> L x [Spatial-Reduction Attention + (Mix)FFN])
with per-stage absolute position embeddings (v1) or conv-FFN + overlapping
patch embeds (v2). SRA computes k/v from an sr_ratio-strided conv reduction
of the token map — plain batched matmuls on the MXU. Unused by the shipped
box-supervision configs (inventory parity)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..layers import Conv2d, Dense, LayerNorm, compute_dtype
from ...registry import BACKBONES


class SpatialReductionAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b, n, c = x.shape
        d = self.dim // self.num_heads
        q = Dense(self.dim, name='q')(x)
        kv_in = x
        if self.sr_ratio > 1:
            xm = x.reshape(b, h, w, c)
            xm = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                         strides=(self.sr_ratio, self.sr_ratio),
                         dtype=compute_dtype(), param_dtype=jnp.float32,
                         name='sr')(xm)
            kv_in = LayerNorm(name='sr_norm')(
                xm.reshape(b, -1, self.dim))
        k = Dense(self.dim, name='k')(kv_in)
        v = Dense(self.dim, name='v')(kv_in)
        m = k.shape[1]
        q = q.reshape(b, n, self.num_heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, self.num_heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, self.num_heads, d).transpose(0, 2, 1, 3)
        attn = jnp.einsum('bhnd,bhmd->bhnm', q, k,
                          preferred_element_type=jnp.float32) * (d ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return Dense(self.dim, name='proj')(out)


class MixFFN(nn.Module):
    """FFN; with ``use_conv``, a 3x3 depthwise conv between the two
    linears (PVTv2)."""
    dim: int
    hidden: int
    use_conv: bool = False

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b, n, c = x.shape
        y = Dense(self.hidden, name='fc1')(x)
        if self.use_conv:
            ym = y.reshape(b, h, w, self.hidden)
            ym = Conv2d(self.hidden, 3, 1, 1, groups=self.hidden,
                        name='dwconv')(ym)
            y = ym.reshape(b, n, self.hidden)
        y = jax.nn.gelu(y, approximate=False)
        return Dense(self.dim, name='fc2')(y)


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: float
    use_conv_ffn: bool = False

    @nn.compact
    def __call__(self, x, hw):
        x = x + SpatialReductionAttention(
            self.dim, self.num_heads, self.sr_ratio, name='attn')(
            LayerNorm(name='norm1')(x), hw)
        x = x + MixFFN(self.dim, int(self.dim * self.mlp_ratio),
                       self.use_conv_ffn, name='ffn')(
            LayerNorm(name='norm2')(x), hw)
        return x


@BACKBONES.register_module()
class PyramidVisionTransformer(nn.Module):
    pretrain_img_size: int = 224
    in_channels: int = 3
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_stages: int = 4
    num_layers: Sequence[int] = (3, 4, 6, 3)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    patch_sizes: Sequence[int] = (4, 2, 2, 2)
    strides: Sequence[int] = (4, 2, 2, 2)
    paddings: Sequence[int] = (0, 0, 0, 0)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    use_abs_pos_embed: bool = True
    use_conv_ffn: bool = False
    norm_after_stage: bool = False
    drop_path_rate: float = 0.1
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        b = x.shape[0]
        for si in range(self.num_stages):
            p, s, pad = (self.patch_sizes[si], self.strides[si],
                         self.paddings[si])
            x = Conv2d(self.embed_dims[si], p, s, pad,
                       name=f'patch_embed{si}')(x)
            h, w = x.shape[1:3]
            tokens = LayerNorm(name=f'embed_norm{si}')(
                x.reshape(b, h * w, -1))
            if self.use_abs_pos_embed:
                # stored at the pretrain grid, bilinear-resized at runtime
                # (reference AbsolutePositionEmbedding.resize_pos_embed)
                grid = self.pretrain_img_size // int(
                    np.prod(self.strides[:si + 1]))
                pos = self.param(f'pos_embed{si}',
                                 nn.initializers.truncated_normal(0.02),
                                 (1, grid * grid, self.embed_dims[si]))
                pos_map = pos.reshape(1, grid, grid, -1)
                from ...ops.upsample import interpolate_bilinear
                pos_map = interpolate_bilinear(pos_map, (h, w))
                tokens = tokens + pos_map.reshape(1, h * w, -1)
            for li in range(self.num_layers[si]):
                tokens = PVTBlock(
                    self.embed_dims[si], self.num_heads[si],
                    self.sr_ratios[si], self.mlp_ratios[si],
                    self.use_conv_ffn,
                    name=f'stage{si}_block{li}')(tokens, (h, w))
            if self.norm_after_stage:
                tokens = LayerNorm(name=f'out_norm{si}')(tokens)
            x = tokens.reshape(b, h, w, -1)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class PyramidVisionTransformerV2(PyramidVisionTransformer):
    """PVTv2 defaults: overlapping patch embeds, conv-FFN, no abs pos
    (reference pvt.py:580-601)."""
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    paddings: Sequence[int] = (3, 1, 1, 1)
    use_abs_pos_embed: bool = False
    use_conv_ffn: bool = True
    norm_after_stage: bool = True
