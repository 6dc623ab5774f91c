"""PAFPN and ChannelMapper necks (reference: mmdet/models/necks/pafpn.py
and channel_mapper.py — part of the reference inventory; no shipped
box-supervision config uses them, but they are drop-in neck options)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import Conv2d, ConvModule, max_pool_torch
from .fpn import _nearest_upsample_to
from ...registry import NECKS


@NECKS.register_module()
class PAFPN(nn.Module):
    """FPN + bottom-up path aggregation (reference pafpn.py:100-152)."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: object = False
    relu_before_extra_convs: bool = False
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        end = len(self.in_channels) if self.end_level in (-1, None) \
            else self.end_level + 1
        used = list(range(self.start_level, end))
        n = len(used)

        laterals = [
            Conv2d(self.out_channels, 1, 1, 0, name=f'lateral_{i}')(
                inputs[idx]) for i, idx in enumerate(used)
        ]
        for i in range(n - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _nearest_upsample_to(
                laterals[i], laterals[i - 1].shape[-3:-1])

        inter = [Conv2d(self.out_channels, 3, 1, 1, name=f'fpn_conv_{i}')(
            laterals[i]) for i in range(n)]

        # bottom-up path aggregation (stride-2 downsample convs)
        for i in range(n - 1):
            inter[i + 1] = inter[i + 1] + Conv2d(
                self.out_channels, 3, 2, 1, name=f'downsample_conv_{i}')(
                inter[i])

        outs = [inter[0]]
        outs += [Conv2d(self.out_channels, 3, 1, 1, name=f'pafpn_conv_{i}')(
            inter[i + 1]) for i in range(n - 1)]

        extra = self.num_outs - n
        if extra > 0:
            if not self.add_extra_convs:
                for _ in range(extra):
                    outs.append(max_pool_torch(outs[-1], 1, 2, 0))
            else:
                src = inputs[used[-1]] if self.add_extra_convs == 'on_input' \
                    else outs[-1]
                for k in range(extra):
                    if k > 0 and self.relu_before_extra_convs:
                        src = jax.nn.relu(src)
                    src = Conv2d(self.out_channels, 3, 2, 1,
                                 name=f'extra_conv_{k}')(src)
                    outs.append(src)
        return tuple(outs)


@NECKS.register_module()
class ChannelMapper(nn.Module):
    """1:1 per-level channel projection (reference channel_mapper.py)."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    kernel_size: int = 3
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    num_outs: Optional[int] = None
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        pad = (self.kernel_size - 1) // 2
        outs = [ConvModule(self.out_channels, self.kernel_size, 1, pad,
                           norm_cfg=self.norm_cfg,
                           act='relu' if self.act_cfg else None,
                           name=f'conv_{i}')(x, train=train)
                for i, x in enumerate(inputs)]
        num_outs = self.num_outs or len(inputs)
        # extra outputs from strided convs on the last input
        src = inputs[-1]
        for k in range(num_outs - len(inputs)):
            src = ConvModule(self.out_channels, 3, 2, 1,
                             norm_cfg=self.norm_cfg,
                             act='relu' if self.act_cfg else None,
                             name=f'extra_conv_{k}')(src, train=train)
            outs.append(src)
        return tuple(outs)


@NECKS.register_module()
class FPN_CARAFE(nn.Module):
    """FPN with CARAFE content-aware top-down upsampling (reference:
    mmdet/models/necks/fpn_carafe.py; the CUDA CARAFEPack becomes the XLA
    formulation in ops/carafe.py)."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    order: tuple = ('conv', 'norm', 'act')
    upsample_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        from ...ops.carafe import CARAFEPack
        up = dict(self.upsample_cfg or dict(
            type='carafe', up_kernel=5, up_group=1, encoder_kernel=3,
            encoder_dilation=1))
        end = len(self.in_channels) if self.end_level in (-1, None) \
            else self.end_level + 1
        used = list(range(self.start_level, end))
        n = len(used)

        laterals = [
            Conv2d(self.out_channels, 1, 1, 0, name=f'lateral_{i}')(
                inputs[idx]) for i, idx in enumerate(used)
        ]
        for i in range(n - 1, 0, -1):
            upsampled = CARAFEPack(
                channels=self.out_channels, scale_factor=2,
                up_kernel=up.get('up_kernel', 5),
                encoder_kernel=up.get('encoder_kernel', 3),
                encoder_dilation=up.get('encoder_dilation', 1),
                name=f'upsample_{i}')(laterals[i])
            # lateral maps may be odd-sized; crop the 2x upsample
            th, tw = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + upsampled[:, :th, :tw]

        outs = [Conv2d(self.out_channels, 3, 1, 1, name=f'fpn_conv_{i}')(
            laterals[i]) for i in range(n)]
        for _ in range(self.num_outs - n):
            outs.append(max_pool_torch(outs[-1], 1, 2, 0))
        return tuple(outs)
