"""Shared NN building blocks (flax.linen, NHWC).

Conv arithmetic follows torch semantics (explicit symmetric padding, not
XLA 'SAME') so that weights converted from torchvision / reference
checkpoints reproduce identical feature maps.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

# ---------------------------------------------------------------------------
# Mixed-precision policy (TPU dual of the reference's Fp16OptimizerHook +
# force_fp32 decorators, mmdet/apis/train.py:182-189, condinst_head.py:364):
# matmul/conv activations run in ``compute_dtype()`` (bf16 when enabled),
# parameters and normalization statistics stay float32, and the detectors
# upcast head outputs to float32 before any loss math. bf16 shares float32's
# exponent range, so no loss scaling is needed.
# The policy is read at TRACE time — set it before jit/init.
_COMPUTE_DTYPE: Optional[Any] = None


def set_compute_dtype(dtype: Optional[Any]) -> None:
    """None = full f32; jnp.bfloat16 enables mixed precision."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def compute_dtype() -> Optional[Any]:
    return _COMPUTE_DTYPE


def f32_tree(tree):
    """Upcast every floating leaf to float32 (loss-boundary force_fp32)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class FrozenBatchNorm(nn.Module):
    """BatchNorm permanently in eval mode: running stats are constants in the
    'batch_stats' collection; scale/bias are trainable parameters.

    Matches the reference backbone setting norm_eval=True
    (configs/boxinst/boxinst_r50_fpn_1x_coco.py backbone).
    """
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((self.features,)))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((self.features,)))
        inv = jax.lax.rsqrt(var.value + self.eps) * scale
        shift = bias - mean.value * inv
        cd = compute_dtype()
        if cd is not None:
            return (x.astype(cd) * inv.astype(cd) + shift.astype(cd))
        return x * inv + shift


class SyncBatchNorm(nn.Module):
    """Train-mode BatchNorm over the global batch.

    Under pjit the whole (sharded) batch lives in one program, so plain
    batch statistics are already globally synced — XLA inserts the
    cross-device reductions. (The reference's per-GPU unsynced BN,
    norm_cfg type='BN' in CondInstMaskBranch/CondInstSegmHead, is strictly
    noisier.) ``axis_name`` is only needed under pmap/shard_map."""
    features: int
    momentum: float = 0.9
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            axis_name=self.axis_name if train else None,
            dtype=compute_dtype(),
        )
        return bn(x)


class GroupNorm32(nn.Module):
    features: int
    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                            dtype=compute_dtype())(x)


def make_norm(norm_cfg, features: int, axis_name: Optional[str] = None):
    """Instantiate a norm layer from an mmcv-style norm_cfg dict."""
    if norm_cfg is None:
        return None
    t = norm_cfg['type']
    if t in ('BN', 'SyncBN'):
        return SyncBatchNorm(features=features, axis_name=axis_name)
    if t == 'FrozenBN':
        return FrozenBatchNorm(features=features)
    if t == 'GN':
        return GroupNorm(norm_cfg.get('num_groups', 32))
    if t == 'LN':
        return LayerNorm()
    raise ValueError(f'unknown norm type {t}')


_TORCH_CONV_INIT = nn.initializers.variance_scaling(
    1.0 / 3.0, 'fan_in', 'uniform')  # ~ torch kaiming_uniform default


def Conv2d(features: int,
           kernel_size: Union[int, Tuple[int, int]] = 3,
           stride: Union[int, Tuple[int, int]] = 1,
           padding: Union[int, Tuple[int, int]] = 0,
           dilation: Union[int, Tuple[int, int]] = 1,
           groups: int = 1,
           use_bias: bool = True,
           kernel_init: Callable = _TORCH_CONV_INIT,
           bias_init: Callable = nn.initializers.zeros,
           name: Optional[str] = None) -> nn.Conv:
    """torch-compatible conv factory: explicit symmetric padding, NHWC.

    Returns a plain nn.Conv so the parameter tree stays flat
    (<name>/kernel, <name>/bias)."""
    k = _pair(kernel_size)
    s = _pair(stride)
    p = _pair(padding)
    d = _pair(dilation)
    return nn.Conv(
        features=features,
        kernel_size=k,
        strides=s,
        padding=((p[0], p[0]), (p[1], p[1])),
        kernel_dilation=d,
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=kernel_init,
        bias_init=bias_init,
        dtype=compute_dtype(),
        param_dtype=jnp.float32,
        name=name,
    )


def LayerNorm(name=None):
    """LayerNorm with torch's epsilon (1e-5; flax defaults to 1e-6 —
    the difference is visible on small feature maps) and policy dtype."""
    return nn.LayerNorm(epsilon=1e-5, dtype=compute_dtype(), name=name)


def GroupNorm(num_groups: int = 32, name=None):
    """GroupNorm with torch's epsilon (1e-5) and policy dtype."""
    return nn.GroupNorm(num_groups=num_groups, epsilon=1e-5,
                        dtype=compute_dtype(), name=name)


def Dense(features: int, use_bias: bool = True,
          kernel_init: Optional[Callable] = None,
          bias_init: Callable = nn.initializers.zeros,
          name: Optional[str] = None) -> nn.Dense:
    """nn.Dense honoring the mixed-precision policy (params stay f32)."""
    kw = {}
    if kernel_init is not None:
        kw['kernel_init'] = kernel_init
    return nn.Dense(features, use_bias=use_bias, bias_init=bias_init,
                    dtype=compute_dtype(), param_dtype=jnp.float32,
                    name=name, **kw)


class ConvModule(nn.Module):
    """conv -> norm -> activation block (reference: mmcv ConvModule).

    Bias is used iff there is no norm, matching mmcv's default.
    """
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    norm_cfg: Optional[dict] = None
    act: Optional[str] = 'relu'
    use_bias: Optional[bool] = None
    kernel_init: Callable = nn.initializers.variance_scaling(
        1.0 / 3.0, 'fan_in', 'uniform')
    axis_name: Optional[str] = None
    conv_type: Optional[str] = None   # None = plain conv; 'DCN' | 'DCNv2'

    @nn.compact
    def __call__(self, x, train: bool = False):
        bias = self.use_bias if self.use_bias is not None \
            else self.norm_cfg is None
        if self.conv_type in ('DCN', 'DCNv2'):
            # tower deformable conv (reference: ConvModule conv_cfg
            # routing into mmcv deform conv, box_solov2_head.py:68-69)
            from .deform_conv import DeformConv2d
            x = DeformConv2d(self.features, self.kernel_size, self.stride,
                             self.padding, self.dilation,
                             modulated=(self.conv_type == 'DCNv2'),
                             use_bias=bias, kernel_init=self.kernel_init,
                             name='conv')(x)
        elif self.conv_type is not None:
            raise ValueError(f'unknown conv type {self.conv_type!r}')
        else:
            x = Conv2d(self.features, self.kernel_size, self.stride,
                       self.padding, self.dilation, use_bias=bias,
                       kernel_init=self.kernel_init, name='conv')(x)
        if self.norm_cfg is not None:
            t = self.norm_cfg['type']
            if t in ('BN', 'SyncBN'):
                # torch BN momentum 0.1 == flax momentum 0.9
                x = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                 dtype=compute_dtype(), name='bn')(
                    x, use_running_average=not train)
            elif t == 'FrozenBN':
                x = FrozenBatchNorm(self.features, name='bn')(x)
            elif t == 'GN':
                x = GroupNorm(self.norm_cfg.get('num_groups', 32),
                              name='gn')(x)
            elif t == 'LN':
                x = LayerNorm(name='ln')(x)
            else:
                raise ValueError(t)
        if self.act == 'relu':
            x = jax.nn.relu(x)
        elif self.act == 'gelu':
            x = jax.nn.gelu(x)
        elif self.act is not None:
            raise ValueError(self.act)
        return x


class Scale(nn.Module):
    """Learnable scalar multiplier (reference: mmcv.cnn.Scale)."""
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param('scale',
                       lambda key: jnp.asarray(self.init_value, jnp.float32))
        return x * s


def max_pool_torch(x, kernel_size: int, stride: int, padding: int):
    """torch-style max pool on NHWC with explicit symmetric padding."""
    return nn.max_pool(
        x,
        window_shape=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )


def normal_conv_init(std: float = 0.01):
    return nn.initializers.normal(stddev=std)


def bias_init_with_prob(prior_prob: float):
    """Focal-loss style bias init: -log((1-p)/p)."""
    import math
    v = -math.log((1 - prior_prob) / prior_prob)
    return nn.initializers.constant(v)
