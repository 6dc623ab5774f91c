"""Misc model bricks (reference: mmdet/models/utils/{se_layer,
inverted_residual,normed_predictor,conv_upsample,res_layer,
brick_wrappers,make_divisible,misc}.py).

flax.linen, NHWC, matching the conventions in models/layers.py. None of
the four shipped methods use these; they complete the reference's
models/utils surface for custom heads/backbones built on this toolbox.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import ConvModule
from ...ops.upsample import interpolate_bilinear


def make_divisible(value, divisor, min_value=None, min_ratio=0.9):
    """Round channels to the nearest divisible value (reference
    make_divisible.py:2-29)."""
    if min_value is None:
        min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < min_ratio * value:
        new_value += divisor
    return new_value


def adaptive_avg_pool2d(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """torch adaptive_avg_pool2d for NHWC (reference brick_wrappers.py:
    15-40). Supports None entries (keep that dim)."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    h, w = x.shape[1], x.shape[2]
    oh = output_size[0] or h
    ow = output_size[1] or w

    def pool_axis(x, axis, n_in, n_out):
        # torch adaptive pooling: bin i covers [floor(i*n/o), ceil((i+1)*n/o))
        starts = [int(jnp.floor(i * n_in / n_out)) for i in range(n_out)]
        ends = [int(-(-((i + 1) * n_in) // n_out)) for i in range(n_out)]
        slices = [jnp.mean(jax.lax.slice_in_dim(x, s, e, axis=axis),
                           axis=axis, keepdims=True)
                  for s, e in zip(starts, ends)]
        return jnp.concatenate(slices, axis=axis)

    x = pool_axis(x, 1, h, oh)
    x = pool_axis(x, 2, w, ow)
    return x


def interpolate_as(source: jnp.ndarray, target) -> jnp.ndarray:
    """Bilinear-resize ``source`` ((N, H, W) or (N, H, W, C)) to the
    spatial shape of ``target`` (reference misc.py:35-72; NHWC here).
    ``target`` is mask-like (..., H, W) when 2D/3D, NHWC when 4D."""
    if target.ndim == 4:
        th, tw = target.shape[1], target.shape[2]
    else:
        th, tw = target.shape[-2], target.shape[-1]
    squeeze = source.ndim == 3
    if squeeze:
        source = source[..., None]
    if source.shape[1:3] != (th, tw):
        source = interpolate_bilinear(source, (th, tw),
                                      align_corners=False)
    return source[..., 0] if squeeze else source


def sigmoid_geometric_mean(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """sqrt(sigmoid(x) * sigmoid(y)) with the reference's straight
    gradient (reference misc.py:6-32 SigmoidGeometricMean autograd fn —
    the backward there IS the analytic gradient, so plain composition
    suffices under autodiff)."""
    return jnp.sqrt(jax.nn.sigmoid(x) * jax.nn.sigmoid(y))


def scale_target(targets: jnp.ndarray,
                 scaled_size: Tuple[int, int] = (96, 96)) -> jnp.ndarray:
    """Bilinear-rescale (N, H, W[, C]) mask targets (reference
    misc.py:75-86 _scale_target, used by the levelset losses)."""
    squeeze = targets.ndim == 3
    if squeeze:
        targets = targets[..., None]
    out = interpolate_bilinear(targets, scaled_size, align_corners=False)
    return out[..., 0] if squeeze else out


class SELayer(nn.Module):
    """Squeeze-and-Excitation (reference se_layer.py:9-60)."""
    channels: int
    ratio: int = 16

    @nn.compact
    def __call__(self, x):
        out = x.mean(axis=(1, 2), keepdims=True)
        out = ConvModule(int(self.channels / self.ratio), 1, act='relu',
                         name='conv1')(out)
        out = ConvModule(self.channels, 1, act=None, name='conv2')(out)
        return x * jax.nn.sigmoid(out)


class DyReLU(nn.Module):
    """Dynamic ReLU, DyHead form (reference se_layer.py:62-134): channel
    attention produces (a1, b1, a2, b2); out = max(x*a1+b1, x*a2+b2)."""
    channels: int
    ratio: int = 4

    @nn.compact
    def __call__(self, x):
        coeffs = x.mean(axis=(1, 2), keepdims=True)
        coeffs = ConvModule(int(self.channels / self.ratio), 1, act='relu',
                            name='conv1')(coeffs)
        coeffs = ConvModule(self.channels * 4, 1, act=None,
                            name='conv2')(coeffs)
        # HSigmoid(bias=3, divisor=6), then shift to [-0.5, 0.5]
        coeffs = jnp.clip((coeffs + 3.0) / 6.0, 0.0, 1.0) - 0.5
        a1, b1, a2, b2 = jnp.split(coeffs, 4, axis=-1)
        a1 = a1 * 2.0 + 1.0
        a2 = a2 * 2.0
        return jnp.maximum(x * a1 + b1, x * a2 + b2)


class InvertedResidual(nn.Module):
    """MobileNetV2/V3 inverted residual (reference
    inverted_residual.py:11-131): 1x1 expand -> depthwise -> optional SE
    -> 1x1 linear, residual iff stride 1 and channels match."""
    in_channels: int
    out_channels: int
    mid_channels: int
    kernel_size: int = 3
    stride: int = 1
    se_ratio: Optional[int] = None
    with_expand_conv: bool = True
    norm_cfg: Optional[dict] = None
    act: str = 'relu'

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.norm_cfg if self.norm_cfg is not None \
            else dict(type='BN')
        out = x
        if self.with_expand_conv:
            out = ConvModule(self.mid_channels, 1, norm_cfg=norm,
                             act=self.act, name='expand_conv')(out, train)
        # depthwise conv
        out = nn.Conv(self.mid_channels, (self.kernel_size,) * 2,
                      strides=(self.stride,) * 2,
                      padding=[(self.kernel_size // 2,) * 2] * 2,
                      feature_group_count=self.mid_channels, use_bias=False,
                      name='depthwise_conv')(out)
        out = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name='dw_bn')(
            out, use_running_average=not train)
        out = jax.nn.relu(out)
        if self.se_ratio is not None:
            out = SELayer(self.mid_channels, self.se_ratio, name='se')(out)
        out = ConvModule(self.out_channels, 1, norm_cfg=norm, act=None,
                         name='linear_conv')(out, train)
        if self.stride == 1 and self.in_channels == self.out_channels:
            return x + out
        return out


class NormedLinear(nn.Module):
    """Cosine-similarity linear classifier (reference
    normed_predictor.py:11-40): both weight rows and inputs L2-normalized
    (to ``power``), scaled by ``tempearture`` [sic]."""
    features: int
    tempearture: float = 20.0
    power: float = 1.0
    eps: float = 1e-6
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param('kernel', nn.initializers.normal(0.01),
                       (x.shape[-1], self.features))
        w = w / (jnp.linalg.norm(w, axis=0, keepdims=True) ** self.power
                 + self.eps)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) ** self.power
                 + self.eps)
        out = (x * self.tempearture) @ w
        if self.use_bias:
            out = out + self.param('bias', nn.initializers.zeros,
                                   (self.features,))
        return out


class NormedConv2d(nn.Module):
    """Cosine-similarity 1x1/kxk conv head (reference
    normed_predictor.py:43-80), NHWC."""
    features: int
    kernel_size: int = 1
    tempearture: float = 20.0
    power: float = 1.0
    eps: float = 1e-6
    norm_over_kernel: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param('kernel', nn.initializers.normal(0.01),
                       (k, k, x.shape[-1], self.features))
        if self.norm_over_kernel:
            n = jnp.linalg.norm(w.reshape(-1, self.features), axis=0,
                                keepdims=True) ** self.power
            w = w / (n.reshape(1, 1, 1, -1) + self.eps)
        else:
            n = jnp.linalg.norm(w, axis=2, keepdims=True) ** self.power
            w = w / (n + self.eps)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) ** self.power
                 + self.eps)
        x = x * self.tempearture
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(k // 2,) * 2] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class ConvUpsample(nn.Module):
    """num_layers 3x3 convs, 2x bilinear upsample after the first
    ``num_upsample`` of them (reference conv_upsample.py:7-99)."""
    inner_channels: int
    num_layers: int = 1
    num_upsample: Optional[int] = None
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ups = self.num_layers if self.num_upsample is None \
            else self.num_upsample
        assert ups <= self.num_layers
        for i in range(self.num_layers):
            x = ConvModule(self.inner_channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, act='relu',
                           name=f'conv{i}')(x, train)
            if ups > 0:
                ups -= 1
                h, w = x.shape[1] * 2, x.shape[2] * 2
                x = interpolate_bilinear(x, (h, w), align_corners=False)
        return x


class SimplifiedBasicBlock(nn.Module):
    """SCNet's norm-light basic block (reference res_layer.py:107-190):
    3x3 conv + norm + relu, 3x3 conv + norm, residual, relu."""
    planes: int
    stride: int = 1
    with_downsample: bool = False
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.norm_cfg if self.norm_cfg is not None \
            else dict(type='BN')
        identity = x
        out = ConvModule(self.planes, 3, stride=self.stride, padding=1,
                         norm_cfg=norm, act='relu', name='conv1')(x, train)
        out = ConvModule(self.planes, 3, padding=1, norm_cfg=norm,
                         act=None, name='conv2')(out, train)
        if self.with_downsample:
            identity = ConvModule(self.planes, 1, stride=self.stride,
                                  norm_cfg=norm, act=None,
                                  name='downsample')(x, train)
        return jax.nn.relu(out + identity)
