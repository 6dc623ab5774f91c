"""CARAFE content-aware upsampling, TPU-native.

The reference consumes mmcv's CUDA ``CARAFEPack`` (used by the FPN_CARAFE
neck, mmdet/models/necks/fpn_carafe.py:4). The reassembly step is a
gather-weighted sum over a k_up x k_up source neighborhood per upsampled
pixel — here an unfold-by-shifted-slices + einsum that XLA fuses; the
kernel-prediction branch (channel compressor -> content encoder ->
pixel shuffle -> softmax) lives in ``CARAFEPack`` below.

Math (CARAFE, ICCV'19): out(p') = sum_n W_{p'}(n) * X(floor(p'/s) + n).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..models.layers import Conv2d, compute_dtype
from .color import shift2d


def carafe_reassemble(x: jnp.ndarray, kernels: jnp.ndarray,
                      scale: int, k_up: int) -> jnp.ndarray:
    """Reassemble ``x`` (B, H, W, C) into (B, sH, sW, C) with per-output
    kernels (B, sH, sW, k_up^2), already softmax-normalized."""
    b, h, w, c = x.shape
    half = k_up // 2
    # unfold source neighborhoods: (B, H, W, k^2, C), zero-padded
    nbrs = jnp.stack([
        shift2d(x, dy, dx, h_axis=1)
        for dy in range(-half, half + 1)
        for dx in range(-half, half + 1)], axis=3)
    # each upsampled pixel reads the neighborhood of its source pixel
    ys = jnp.arange(h * scale) // scale
    xs = jnp.arange(w * scale) // scale
    nbrs_up = nbrs[:, ys][:, :, xs]                  # (B, sH, sW, k^2, C)
    return jnp.einsum('bhwkc,bhwk->bhwc', nbrs_up, kernels,
                      preferred_element_type=jnp.float32).astype(x.dtype)


class CARAFEPack(nn.Module):
    """Kernel prediction + reassembly (mmcv CARAFEPack equivalent)."""
    channels: int
    scale_factor: int = 2
    up_kernel: int = 5
    up_group: int = 1           # 1 in all shipped uses
    encoder_kernel: int = 3
    encoder_dilation: int = 1
    compressed_channels: int = 64

    @nn.compact
    def __call__(self, x):
        s = self.scale_factor
        k2 = self.up_kernel ** 2
        comp = Conv2d(self.compressed_channels, 1, 1, 0,
                      name='channel_compressor')(x)
        enc = Conv2d(s * s * k2, self.encoder_kernel, 1,
                     (self.encoder_kernel - 1) // 2 *
                     self.encoder_dilation,
                     dilation=self.encoder_dilation,
                     name='content_encoder')(comp)
        b, h, w, _ = enc.shape
        # pixel shuffle: (B, H, W, s*s*k2) -> (B, sH, sW, k2)
        enc = enc.reshape(b, h, w, s, s, k2)
        enc = enc.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s, k2)
        kernels = jax.nn.softmax(enc.astype(jnp.float32), axis=-1)
        return carafe_reassemble(x, kernels.astype(x.dtype), s,
                                 self.up_kernel)
