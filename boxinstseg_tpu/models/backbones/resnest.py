"""ResNeSt backbone (reference: mmdet/models/backbones/resnest.py, 322 LoC),
flax/NHWC: ResNet-style stages whose bottleneck 3x3 is a Split-Attention
conv (radix-way grouped conv + radix softmax over global-pooled gates).
Unused by the shipped box-supervision configs (inventory parity); stem is
the ResNeSt deep stem (3x 3x3 convs)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import Conv2d, FrozenBatchNorm, max_pool_torch
from ...registry import BACKBONES

_ARCH = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
    200: (3, 24, 36, 3),
}


class SplitAttentionConv(nn.Module):
    """radix-way split attention (reference SplitAttentionConv2d,
    resnest.py:41-152)."""
    channels: int
    stride: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4

    @nn.compact
    def __call__(self, x):
        r = self.radix
        c = self.channels
        inter = max(x.shape[-1] * r // self.reduction_factor, 32)
        out = Conv2d(c * r, 3, self.stride, 1, groups=self.groups * r,
                     use_bias=False, name='conv')(x)
        out = FrozenBatchNorm(c * r, name='bn0')(out)
        out = jax.nn.relu(out)
        b, h, w, _ = out.shape
        splits = out.reshape(b, h, w, r, c)
        gap = splits.sum(axis=3).mean(axis=(1, 2))          # (B, C)
        gap = Conv2d(inter, 1, 1, 0, groups=self.groups,
                     name='fc1')(gap[:, None, None, :])
        gap = jax.nn.relu(FrozenBatchNorm(inter, name='bn1')(gap))
        atten = Conv2d(c * r, 1, 1, 0, groups=self.groups,
                       name='fc2')(gap)[:, 0, 0]            # (B, C*r)
        # radix softmax within each group (reference RSoftmax)
        g = self.groups
        a = atten.reshape(b, g, r, c // g)
        a = jax.nn.softmax(a.astype(jnp.float32), axis=2).astype(out.dtype)
        a = a.transpose(0, 2, 1, 3).reshape(b, r, c)
        return (splits * a[:, None, None]).sum(axis=3)      # (B, H, W, C)


class SplitBottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    groups: int = 1
    base_width: int = 4
    radix: int = 2
    avg_down_stride: bool = True

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = Conv2d(width, 1, 1, 0, use_bias=False, name='conv1')(x)
        out = jax.nn.relu(FrozenBatchNorm(width, name='bn1')(out))
        # ResNeSt: stride moves into an avg pool before the SA conv
        if self.stride > 1 and self.avg_down_stride:
            out = nn.avg_pool(out, (3, 3), (self.stride, self.stride),
                              padding=((1, 1), (1, 1)))
            sa_stride = 1
        else:
            sa_stride = self.stride
        out = SplitAttentionConv(width, sa_stride, self.groups,
                                 self.radix, name='conv2')(out)
        out = Conv2d(self.planes * 4, 1, 1, 0, use_bias=False,
                     name='conv3')(out)
        out = FrozenBatchNorm(self.planes * 4, name='bn3')(out)
        if self.has_downsample:
            # avg_down downsample (avg pool + 1x1 conv)
            idn = x
            if self.stride > 1:
                idn = nn.avg_pool(idn, (self.stride, self.stride),
                                  (self.stride, self.stride))
            idn = Conv2d(self.planes * 4, 1, 1, 0, use_bias=False,
                         name='downsample_conv')(idn)
            identity = FrozenBatchNorm(self.planes * 4,
                                       name='downsample_bn')(idn)
        return jax.nn.relu(out + identity)


@BACKBONES.register_module()
class ResNeSt(nn.Module):
    depth: int = 50
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    groups: int = 1
    base_width: int = 4
    radix: int = 2
    stem_channels: int = 64
    norm_eval: bool = True
    style: str = 'pytorch'
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = _ARCH[self.depth]
        sc = self.stem_channels
        # deep stem: 3x 3x3 convs (reference resnest deep_stem=True)
        for i, (cout, stride) in enumerate([(sc // 2, 2), (sc // 2, 1),
                                            (sc, 1)]):
            x = Conv2d(cout, 3, stride, 1, use_bias=False,
                       name=f'stem_conv{i}')(x)
            x = jax.nn.relu(FrozenBatchNorm(cout, name=f'stem_bn{i}')(x))
        x = max_pool_torch(x, 3, 2, 1)

        outs = []
        planes = 64
        for s, n_blocks in enumerate(blocks[:self.num_stages]):
            for b in range(n_blocks):
                stride = 2 if (s > 0 and b == 0) else 1
                x = SplitBottleneck(
                    planes, stride,
                    has_downsample=(b == 0),
                    groups=self.groups, base_width=self.base_width,
                    radix=self.radix, name=f'layer{s + 1}_{b}')(x)
            if s <= self.frozen_stages - 1:
                x = jax.lax.stop_gradient(x)
            if s in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
