"""Fallback pixel decoders for MaskFormer-style heads (reference:
mmdet/models/plugins/pixel_decoder.py — PixelDecoder is an FPN-shaped
top-down fuse; TransformerEncoderPixelDecoder additionally runs a plain
(non-deformable) transformer encoder on the lowest-resolution level
before fusing, :120-243). NHWC flax modules; the shipped Box2Mask
configs use MSDeformAttnPixelDecoder — these are the registry-complete
alternatives."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax

from ..layers import Conv2d, ConvModule
from ..utils.positional_encoding import SinePositionalEncoding
from ..utils.transformer import DetrTransformerEncoder


def _upsample_nearest(x, h, w):
    b, sh, sw, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method='nearest')


class PixelDecoder(nn.Module):
    """FPN-shaped pixel decoder: laterals on all but the last input,
    3x3 output convs top-down, stride-4 mask feature
    (reference: pixel_decoder.py:12-113)."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    feat_channels: int = 256
    out_channels: int = 256
    norm_cfg: Optional[dict] = None

    def _norm(self):
        return self.norm_cfg if self.norm_cfg is not None \
            else dict(type='GN', num_groups=32)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: low->high stride NHWC list. Returns
        (mask_feature (B, H/4, W/4, out), memory = last level)."""
        n = len(self.in_channels)
        norm = self._norm()
        y = ConvModule(self.feat_channels, 3, padding=1, norm_cfg=norm,
                       name='last_feat_conv')(feats[-1], train)
        for i in range(n - 2, -1, -1):
            cur = ConvModule(self.feat_channels, 1, norm_cfg=norm,
                             act=None, name=f'lateral_convs_{i}')(
                feats[i], train)
            y = cur + _upsample_nearest(y, cur.shape[1], cur.shape[2])
            y = ConvModule(self.feat_channels, 3, padding=1, norm_cfg=norm,
                           name=f'output_convs_{i}')(y, train)
        mask_feature = Conv2d(self.out_channels, 3, padding=1,
                              name='mask_feature')(y)
        return mask_feature, feats[-1]


class TransformerEncoderPixelDecoder(nn.Module):
    """PixelDecoder with a full-attention transformer encoder refining the
    last level first (reference: pixel_decoder.py:115-243); ``memory`` is
    the encoder output."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    feat_channels: int = 256
    out_channels: int = 256
    norm_cfg: Optional[dict] = None
    num_encoder_layers: int = 6
    num_heads: int = 8
    feedforward_channels: int = 2048

    @nn.compact
    def __call__(self, feats, train: bool = False):
        n = len(self.in_channels)
        norm = self.norm_cfg if self.norm_cfg is not None \
            else dict(type='GN', num_groups=32)
        x = Conv2d(self.feat_channels, 1, name='encoder_in_proj')(feats[-1])
        b, h, w, c = x.shape
        pos = SinePositionalEncoding(self.feat_channels // 2,
                                     normalize=True)(b, h, w)
        memory = DetrTransformerEncoder(
            self.num_encoder_layers, self.feat_channels, self.num_heads,
            self.feedforward_channels, name='encoder')(
            x.reshape(b, h * w, c), pos.reshape(b, h * w, c))
        memory = memory.reshape(b, h, w, c)
        y = ConvModule(self.feat_channels, 3, padding=1, norm_cfg=norm,
                       name='encoder_out_proj')(memory, train)
        for i in range(n - 2, -1, -1):
            cur = ConvModule(self.feat_channels, 1, norm_cfg=norm,
                             act=None, name=f'lateral_convs_{i}')(
                feats[i], train)
            y = cur + _upsample_nearest(y, cur.shape[1], cur.shape[2])
            y = ConvModule(self.feat_channels, 3, padding=1, norm_cfg=norm,
                           name=f'output_convs_{i}')(y, train)
        mask_feature = Conv2d(self.out_channels, 3, padding=1,
                              name='mask_feature')(y)
        return mask_feature, memory
