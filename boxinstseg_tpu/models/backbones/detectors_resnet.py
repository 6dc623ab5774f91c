"""DetectoRS ResNet backbone (reference:
mmdet/models/backbones/detectors_resnet.py, 353 LoC + mmcv SAC op).

ResNet whose bottleneck 3x3 is a Switchable Atrous Convolution: the same
(weight-standardized) kernel evaluated at dilation 1 and dilation 3,
blended per-pixel by a learned switch, with pre/post global-context 1x1
convs; the first block of every stage can also ingest a Recursive Feature
Pyramid feature through a zero-initialized ``rfp_conv`` (rfp_forward,
reference :73-118). Unused by the shipped box-supervision configs
(inventory parity)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import Conv2d, FrozenBatchNorm, max_pool_torch
from ...registry import BACKBONES

_ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class SAConv(nn.Module):
    """Switchable Atrous Convolution (mmcv SAConv2d equivalent)."""
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        c = self.channels
        # global context before the switch (mmcv pre_context)
        gc = Conv2d(x.shape[-1], 1, 1, 0, name='pre_context')(
            x.mean(axis=(1, 2), keepdims=True))
        x = x + gc
        switch = Conv2d(1, 1, self.stride, 0, name='switch',
                        bias_init=nn.initializers.ones)(
            nn.avg_pool(x, (5, 5), (1, 1), padding=((2, 2), (2, 2))))
        switch = jax.nn.sigmoid(switch.astype(jnp.float32)).astype(x.dtype)

        # shared weight-standardized kernel; the dilated branch adds a
        # learned delta (mmcv ConvAWS2d + weight_diff)
        kernel = self.param('weight', nn.initializers.he_normal(),
                            (3, 3, x.shape[-1], c))
        std = jnp.sqrt(kernel.astype(jnp.float32).var(
            axis=(0, 1, 2), keepdims=True) + 1e-5)
        mean = kernel.astype(jnp.float32).mean(axis=(0, 1, 2),
                                               keepdims=True)
        w_std = ((kernel - mean) / std).astype(x.dtype)
        w_diff = self.param('weight_diff', nn.initializers.zeros,
                            (3, 3, x.shape[-1], c))

        def conv(w, dilation):
            pad = dilation
            return jax.lax.conv_general_dilated(
                x, w, (self.stride, self.stride),
                [(pad, pad), (pad, pad)],
                rhs_dilation=(dilation, dilation),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        out_s = conv(w_std, 1)
        out_l = conv(w_std + w_diff, 3)
        out = switch * out_s + (1.0 - switch) * out_l
        gc2 = Conv2d(c, 1, 1, 0, name='post_context')(
            out.mean(axis=(1, 2), keepdims=True))
        return out + gc2


class SACBottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    rfp_inplanes: Optional[int] = None

    @nn.compact
    def __call__(self, x, rfp_feat=None):
        identity = x
        out = Conv2d(self.planes, 1, 1, 0, use_bias=False, name='conv1')(x)
        out = jax.nn.relu(FrozenBatchNorm(self.planes, name='bn1')(out))
        out = SAConv(self.planes, self.stride, name='conv2')(out)
        out = jax.nn.relu(FrozenBatchNorm(self.planes, name='bn2')(out))
        out = Conv2d(self.planes * 4, 1, 1, 0, use_bias=False,
                     name='conv3')(out)
        out = FrozenBatchNorm(self.planes * 4, name='bn3')(out)
        if self.has_downsample:
            identity = Conv2d(self.planes * 4, 1, self.stride, 0,
                              use_bias=False, name='downsample_conv')(x)
            identity = FrozenBatchNorm(self.planes * 4,
                                       name='downsample_bn')(identity)
        out = jax.nn.relu(out + identity)
        if self.rfp_inplanes and rfp_feat is not None:
            # zero-initialized: RFP starts as identity (reference :62-71)
            out = out + Conv2d(self.planes * 4, 1, 1, 0,
                               kernel_init=nn.initializers.zeros,
                               name='rfp_conv')(rfp_feat)
        return out


@BACKBONES.register_module()
class DetectoRS_ResNet(nn.Module):
    depth: int = 50
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    sac: Optional[dict] = None            # accepted for config parity
    stage_with_sac: Sequence[bool] = (False, True, True, True)
    rfp_inplanes: Optional[int] = None
    output_img: bool = False
    norm_eval: bool = True
    style: str = 'pytorch'
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, rfp_feats=None, train: bool = False):
        img = x
        blocks = _ARCH[self.depth]
        x = Conv2d(64, 7, 2, 3, use_bias=False, name='conv1')(x)
        x = jax.nn.relu(FrozenBatchNorm(64, name='bn1')(x))
        x = max_pool_torch(x, 3, 2, 1)

        outs = [img] if self.output_img else []
        planes = 64
        for s, n_blocks in enumerate(blocks[:self.num_stages]):
            rfp = None if rfp_feats is None else rfp_feats[s]
            for b in range(n_blocks):
                stride = 2 if (s > 0 and b == 0) else 1
                x = SACBottleneck(
                    planes, stride, has_downsample=(b == 0),
                    rfp_inplanes=self.rfp_inplanes if b == 0 else None,
                    name=f'layer{s + 1}_{b}')(
                    x, rfp if b == 0 else None)
            if s <= self.frozen_stages - 1:
                x = jax.lax.stop_gradient(x)
            if s in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
