"""Feature Pyramid Network (reference: mmdet/models/necks/fpn.py, 204 LoC).

Supports the two layouts the shipped configs use:
- BoxInst: start_level=1, num_outs=5, add_extra_convs='on_output',
  relu_before_extra_convs=True  -> P3..P7.
- DiscoBox / BoxLevelset: start_level=0, num_outs=5 -> P2..P6 where P6 is
  max-pooled from P5 when add_extra_convs is falsy.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import Conv2d, max_pool_torch
from ...ops.upsample import interpolate_bilinear
from ...registry import NECKS


def _nearest_upsample_to(x, hw):
    h, w = hw
    sh, sw = x.shape[-3], x.shape[-2]
    ys = (jnp.arange(h) * sh) // h
    xs = (jnp.arange(w) * sw) // w
    return x[..., ys, :, :][..., :, xs, :]


@NECKS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: object = False   # False | 'on_input' | 'on_lateral' | 'on_output'
    relu_before_extra_convs: bool = False
    no_norm_on_lateral: bool = False
    upsample_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        end = len(self.in_channels) if self.end_level in (-1, None) \
            else self.end_level + 1
        used = list(range(self.start_level, end))
        num_laterals = len(used)

        laterals = [
            Conv2d(self.out_channels, 1, 1, 0, name=f'lateral_{i}')(
                inputs[idx])
            for i, idx in enumerate(used)
        ]
        # top-down pathway (nearest upsample, like F.interpolate nearest)
        for i in range(num_laterals - 1, 0, -1):
            hw = laterals[i - 1].shape[-3:-1]
            laterals[i - 1] = laterals[i - 1] + _nearest_upsample_to(
                laterals[i], hw)

        outs = [
            Conv2d(self.out_channels, 3, 1, 1, name=f'fpn_conv_{i}')(
                laterals[i])
            for i in range(num_laterals)
        ]

        extra_levels = self.num_outs - num_laterals
        if extra_levels > 0:
            if not self.add_extra_convs:
                for _ in range(extra_levels):
                    outs.append(max_pool_torch(outs[-1], 1, 2, 0))
            else:
                if self.add_extra_convs == 'on_input':
                    extra_src = inputs[used[-1]]
                elif self.add_extra_convs == 'on_lateral':
                    extra_src = laterals[-1]
                else:  # 'on_output'
                    extra_src = outs[-1]
                for k in range(extra_levels):
                    if k > 0 and self.relu_before_extra_convs:
                        extra_src = jax.nn.relu(extra_src)
                    extra_src = Conv2d(self.out_channels, 3, 2, 1,
                                       name=f'extra_conv_{k}')(extra_src)
                    outs.append(extra_src)
        return tuple(outs)
