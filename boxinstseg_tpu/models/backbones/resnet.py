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


def _avg_pool_ceil(x, k, s):
    """torch AvgPool2d(kernel=k, stride=s, ceil_mode=True,
    count_include_pad=False) for NHWC (the V1d avg_down pooling,
    reference resnet.py ResLayer avg_down branch)."""
    import jax.lax as lax
    h, w = x.shape[1], x.shape[2]
    oh = -(-h // s)
    ow = -(-w // s)
    pad_h = max((oh - 1) * s + k - h, 0)
    pad_w = max((ow - 1) * s + k - w, 0)
    dims, strides = (1, k, k, 1), (1, s, s, 1)
    pads = [(0, 0), (0, pad_h), (0, pad_w), (0, 0)]
    sums = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pads)
    return sums / cnt


class _StemConv7(nn.Module):
    """The 7x7/stride-2 stem conv computed as an EXACT 4x4/stride-1 conv
    over 2x2 space-to-depth input.

    A 3-input-channel 7x7 conv starves the MXU (channels pad 3 -> 8 and
    the 800x1344 canvas is re-read per tap): profiled 5.4 ms/step of the
    BoxInst b8 bench, HBM-bound. Rearranging 2x2 pixel blocks into 12
    channels turns it into a 4x4 conv with 12 input channels on a
    quarter-size grid — same FLOPs, 4x better channel utilization, one
    quarter the rows. The parameter keeps the reference's (7,7,3,F)
    layout (checkpoint converters and init untouched); the kernel is
    re-laid-out at apply time:

      y[i,j] = sum_{a,b} w7[a,b] x[2i+a-3, 2j+b-3]  with a-3 = 2t+dy
      => w4[t+2, u+2, (dy,dx,ch)] = w7[2(t+2)+dy-1, 2(u+2)+dx-1, ch]
      (zero-padded at the one out-of-range tap), conv stride 1 with
      asymmetric padding (2,1) so output i covers s2d rows i-2..i+1.

    Falls back to the plain conv for odd canvases (never hit: every
    pipeline pads to size_divisor=32)."""
    features: int = 64

    @nn.compact
    def __call__(self, x):
        from ..layers import _TORCH_CONV_INIT, compute_dtype
        w7 = self.param('kernel', _TORCH_CONV_INIT, (7, 7, 3, self.features))
        cd = compute_dtype() or x.dtype
        x = x.astype(cd)
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x, w7.astype(cd), (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x4 = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x4 = x4.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        wp = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))       # (8,8,3,F)
        w4 = wp.reshape(4, 2, 4, 2, c, self.features)
        w4 = w4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c,
                                                    self.features)
        return jax.lax.conv_general_dilated(
            x4, w4.astype(cd), (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    avg_down: bool = False

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
            identity = x
            if self.avg_down and self.stride != 1:
                identity = _avg_pool_ceil(identity, self.stride, self.stride)
            identity = Conv2d(self.planes, 1,
                              1 if self.avg_down else self.stride, 0,
                              use_bias=False, name='downsample_conv')(identity)
            identity = FrozenBatchNorm(self.planes, name='downsample_bn')(
                identity)
        return jax.nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int           # bottleneck width; output is planes * 4
    stride: int = 1
    has_downsample: bool = False
    avg_down: bool = False
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
            identity = x
            if self.avg_down and self.stride != 1:
                identity = _avg_pool_ceil(identity, self.stride, self.stride)
            identity = Conv2d(out_planes, 1,
                              1 if self.avg_down else self.stride, 0,
                              use_bias=False, name='downsample_conv')(identity)
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
    deep_stem: bool = False       # V1d: three 3x3 convs instead of the 7x7
    avg_down: bool = False        # V1d: avgpool shortcut downsampling
    stem_channels: int = 64
    init_cfg: Optional[dict] = None
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_type, stage_blocks = _ARCH[self.depth]
        block_cls = Bottleneck if block_type == 'bottleneck' else BasicBlock
        expansion = 4 if block_type == 'bottleneck' else 1

        x = x.astype(self.compute_dtype)
        if self.deep_stem:
            # reference resnet.py make_stem_layer deep_stem branch
            c = self.stem_channels
            for i, (feats, stride) in enumerate(((c // 2, 2), (c // 2, 1),
                                                 (c, 1))):
                x = Conv2d(feats, 3, stride, 1, use_bias=False,
                           name=f'stem_conv{i}')(x)
                x = FrozenBatchNorm(feats, name=f'stem_bn{i}')(x)
                x = jax.nn.relu(x)
        else:
            x = _StemConv7(64, name='conv1')(x)
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
                    avg_down=self.avg_down,
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


@BACKBONES.register_module()
class ResNetV1d(ResNet):
    """ResNet V1d (reference resnet.py:320-672 deep_stem/avg_down
    options): 3x 3x3 stem convs and average-pool shortcut downsampling."""
    deep_stem: bool = True
    avg_down: bool = True
