"""ResNet / ResNeXt backbones (NHWC, frozen-BN).

Capability-parity rebuild of the reference backbone
(reference: mmdet/models/backbones/resnet.py, 672 LoC) with the settings the
shipped configs actually use: depth 50/101, 'pytorch' style (stride-2 on the
3x3 conv of each bottleneck), frozen_stages, norm_eval (all BN frozen),
torchvision weight layout. Written TPU-first: NHWC, bf16-friendly, and the
frozen stages are wrapped in stop_gradient so XLA prunes their backward.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import Conv2d, FrozenBatchNorm, max_pool_torch
from ...registry import BACKBONES

_ARCH = {
    18: ('basic', (2, 2, 2, 2)),
    34: ('basic', (3, 4, 6, 3)),
    50: ('bottleneck', (3, 4, 6, 3)),
    101: ('bottleneck', (3, 4, 23, 3)),
    152: ('bottleneck', (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = Conv2d(self.planes, 3, self.stride, 1, use_bias=False,
                     name='conv1')(x)
        out = FrozenBatchNorm(self.planes, name='bn1')(out)
        out = jax.nn.relu(out)
        out = Conv2d(self.planes, 3, 1, 1, use_bias=False, name='conv2')(out)
        out = FrozenBatchNorm(self.planes, name='bn2')(out)
        if self.has_downsample:
            identity = Conv2d(self.planes, 1, self.stride, 0, use_bias=False,
                              name='downsample_conv')(x)
            identity = FrozenBatchNorm(self.planes, name='downsample_bn')(
                identity)
        return jax.nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int           # bottleneck width; output is planes * 4
    stride: int = 1
    has_downsample: bool = False
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_planes = self.planes * 4
        identity = x
        out = Conv2d(width, 1, 1, 0, use_bias=False, name='conv1')(x)
        out = FrozenBatchNorm(width, name='bn1')(out)
        out = jax.nn.relu(out)
        # 'pytorch' style: stride on the 3x3 conv (reference resnet.py).
        out = Conv2d(width, 3, self.stride, 1, groups=self.groups,
                     use_bias=False, name='conv2')(out)
        out = FrozenBatchNorm(width, name='bn2')(out)
        out = jax.nn.relu(out)
        out = Conv2d(out_planes, 1, 1, 0, use_bias=False, name='conv3')(out)
        out = FrozenBatchNorm(out_planes, name='bn3')(out)
        if self.has_downsample:
            identity = Conv2d(out_planes, 1, self.stride, 0, use_bias=False,
                              name='downsample_conv')(x)
            identity = FrozenBatchNorm(out_planes, name='downsample_bn')(
                identity)
        return jax.nn.relu(out + identity)


@BACKBONES.register_module()
class ResNet(nn.Module):
    """Outputs the feature maps selected by out_indices (0->C2 ... 3->C5)."""
    depth: int = 50
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1       # -1 none; 0 stem; k >= 1 stem + k stages
    groups: int = 1
    base_width: int = 64
    zero_init_residual: bool = False   # init-time concern; kept for config parity
    norm_cfg: Optional[dict] = None    # BN is always frozen (norm_eval)
    norm_eval: bool = True
    style: str = 'pytorch'
    init_cfg: Optional[dict] = None
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_type, stage_blocks = _ARCH[self.depth]
        block_cls = Bottleneck if block_type == 'bottleneck' else BasicBlock
        expansion = 4 if block_type == 'bottleneck' else 1

        x = x.astype(self.compute_dtype)
        x = Conv2d(64, 7, 2, 3, use_bias=False, name='conv1')(x)
        x = FrozenBatchNorm(64, name='bn1')(x)
        x = jax.nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        for stage_idx in range(self.num_stages):
            planes = 64 * (2 ** stage_idx)
            blocks = stage_blocks[stage_idx]
            stride = 1 if stage_idx == 0 else 2
            for b in range(blocks):
                has_down = (b == 0 and (stride != 1 or
                                        planes * expansion != x.shape[-1]))
                x = block_cls(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    has_downsample=has_down,
                    name=f'layer{stage_idx + 1}_{b}',
                    **({'groups': self.groups, 'base_width': self.base_width}
                       if block_type == 'bottleneck' else {}),
                )(x)
            if self.frozen_stages >= stage_idx + 1:
                x = jax.lax.stop_gradient(x)
            if stage_idx in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class ResNeXt(ResNet):
    """ResNeXt: grouped bottlenecks (reference: backbones/resnext.py)."""
    groups: int = 32
    base_width: int = 4
