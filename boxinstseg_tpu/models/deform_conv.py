"""Deformable convolution (DCNv1 / DCNv2) for tower ConvModules.

The reference accepts ``use_dcn_in_tower``/``type_dcn`` on the SOLO-style
heads and routes them into mmcv's CUDA deform conv via ConvModule's
``conv_cfg`` (reference: mmdet/models/dense_heads/box_solov2_head.py:33-34,
68-69; discobox_head.py:675-676, 764-765; kernels live in mmcv). No shipped
config turns it on, but silently ignoring the flag was a config lie — this
is a real TPU implementation.

TPU-first formulation: the offset/mask branch is a plain conv (zero-init
mmcv *Pack semantics: DCNv1 starts as the regular conv; DCNv2 starts
at 0.5x of it — sigmoid(0) masks); sampling all
``kh*kw`` taps is ONE flat row-gather over the 2x2-patch table per tap
(rows pay per-ROW on TPU, the 4-corner form would cost 4x the rows — see
docs/tpu_performance_notes.md), and the kernel contraction is one MXU
matmul over the concatenated taps: ``(B*H*W, K*Cin) @ (K*Cin, Cout)``.

Semantics match torchvision.ops.deform_conv2d / mmcv deform_conv2d:
offset channels are ``[dy_0, dx_0, dy_1, dx_1, ...]`` in kernel
row-major tap order; DCNv2 additionally applies a sigmoid mask per tap.
Supports stride/dilation/padding; ``deform_groups=1`` (all shipped and
reference configs).
"""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv2d, compute_dtype, _TORCH_CONV_INIT
from ..ops.patch import bilinear_patch_table


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def deform_sample_taps(x: jnp.ndarray, pos_y: jnp.ndarray,
                       pos_x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample ``x`` (B, H, W, C) at per-tap pixel positions
    (B, N, K) with zero padding outside — one flat patch-row gather for
    ALL taps. Returns (B, N, K, C)."""
    b, h, w, c = x.shape
    _, n, k = pos_y.shape
    y0 = jnp.floor(pos_y)
    x0 = jnp.floor(pos_x)
    wy = (pos_y - y0).astype(jnp.float32)
    wx = (pos_x - x0).astype(jnp.float32)
    ok = ((x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1))
    xi = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)
    yi = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)

    patch = bilinear_patch_table(x)
    flat = patch.reshape(b * (h + 1) * (w + 1), 4 * c)
    base = (jnp.arange(b, dtype=jnp.int32)
            * ((h + 1) * (w + 1))).reshape(b, 1, 1)
    idx = (base + yi * (w + 1) + xi).reshape(-1)
    rows = jnp.take(flat, idx, axis=0).reshape(b, n, k, 4, c)
    w4 = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                    wy * (1 - wx), wy * wx], axis=-1)   # (b, n, k, 4)
    w4 = w4 * ok.astype(jnp.float32)[..., None]
    return (rows * w4[..., None].astype(rows.dtype)).sum(axis=3)


class DeformConv2d(nn.Module):
    """Deformable 2D convolution (NHWC).

    ``modulated=True`` is DCNv2 (per-tap sigmoid mask); False is DCNv1.
    The offset (and mask) branch is a regular zero-initialized conv
    (mmcv *Pack semantics): at init DCNv1 equals the plain convolution
    exactly; DCNv2 equals 0.5x the plain convolution because the
    zero-init mask logits sigmoid to 0.5 per tap (same in mmcv).
    """
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 1
    dilation: Union[int, Tuple[int, int]] = 1
    modulated: bool = True
    use_bias: bool = True
    kernel_init: object = _TORCH_CONV_INIT

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        dh, dw = _pair(self.dilation)
        k = kh * kw
        b, h, w, cin = x.shape
        oh = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
        ow = (w + 2 * pw - dw * (kw - 1) - 1) // sw + 1

        # offset (+ mask) branch: zero-init conv over the SAME receptive
        # field (mmcv DeformConv2dPack/ModulatedDeformConv2dPack)
        off_ch = (3 if self.modulated else 2) * k
        off = Conv2d(off_ch, (kh, kw), (sh, sw), (ph, pw), (dh, dw),
                     use_bias=True, kernel_init=nn.initializers.zeros,
                     name='conv_offset')(x)
        off = off.astype(jnp.float32)
        if self.modulated:
            o_y = off[..., 0:2 * k:2]
            o_x = off[..., 1:2 * k:2]
            mask = jax.nn.sigmoid(off[..., 2 * k:])
        else:
            o_y = off[..., 0:2 * k:2]
            o_x = off[..., 1:2 * k:2]
            mask = None

        # base sampling grid: output pixel (i, j), tap (a, b) samples
        # input at (i*sh - ph + a*dh + dy, j*sw - pw + b*dw + dx)
        gy = (jnp.arange(oh, dtype=jnp.float32) * sh - ph)
        gx = (jnp.arange(ow, dtype=jnp.float32) * sw - pw)
        tap_y = jnp.repeat(jnp.arange(kh, dtype=jnp.float32) * dh, kw)
        tap_x = jnp.tile(jnp.arange(kw, dtype=jnp.float32) * dw, (kh,))
        base_y = jnp.broadcast_to(
            gy[:, None, None] + tap_y[None, None, :], (oh, ow, k))
        base_x = jnp.broadcast_to(
            gx[None, :, None] + tap_x[None, None, :], (oh, ow, k))

        pos_y = base_y[None] + o_y.reshape(b, oh, ow, k)
        pos_x = base_x[None] + o_x.reshape(b, oh, ow, k)
        smp = deform_sample_taps(x, pos_y.reshape(b, oh * ow, k),
                                 pos_x.reshape(b, oh * ow, k))
        if mask is not None:
            smp = smp * mask.reshape(b, oh * ow, k, 1).astype(smp.dtype)

        # one MXU contraction over (tap, cin)
        kernel = self.param('kernel', self.kernel_init,
                            (kh, kw, cin, self.features))
        cd = compute_dtype() or x.dtype
        out = jax.lax.dot_general(
            smp.reshape(b, oh * ow, k * cin).astype(cd),
            kernel.reshape(k * cin, self.features).astype(cd),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cd)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,))
            out = out + bias.astype(out.dtype)
        return out.reshape(b, oh, ow, self.features)
