"""Positional encodings (reference:
mmdet/models/utils/positional_encoding.py — SinePositionalEncoding and
LearnedPositionalEncoding, 163 LoC).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


class SinePositionalEncoding:
    """Produces (B, H, W, 2*num_feats) sine/cosine position embeddings."""

    def __init__(self, num_feats: int = 128, temperature: float = 10000,
                 normalize: bool = True, scale: float = 2 * math.pi,
                 eps: float = 1e-6, offset: float = 0.0):
        self.num_feats = num_feats
        self.temperature = temperature
        self.normalize = normalize
        self.scale = scale
        self.eps = eps
        self.offset = offset

    def __call__(self, b: int, h: int, w: int) -> jnp.ndarray:
        # cumsum over an all-ones (no padding) mask == 1-based coordinates
        y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
        x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
        y = jnp.broadcast_to(y, (h, w))
        x = jnp.broadcast_to(x, (h, w))
        if self.normalize:
            y = (y + self.offset) / (h + self.eps) * self.scale
            x = (x + self.offset) / (w + self.eps) * self.scale
        dim_t = jnp.arange(self.num_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.num_feats)
        pos_x = x[..., None] / dim_t
        pos_y = y[..., None] / dim_t
        pos_x = jnp.stack(
            [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
            axis=-1).reshape(h, w, -1)
        pos_y = jnp.stack(
            [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
            axis=-1).reshape(h, w, -1)
        pos = jnp.concatenate([pos_y, pos_x], axis=-1)
        return jnp.broadcast_to(pos[None], (b, h, w, pos.shape[-1]))


class LearnedPositionalEncoding(nn.Module):
    """Learnable row/col embedding table (reference:
    mmdet/models/utils/positional_encoding.py:107-155 — returns
    [x_embed, y_embed] concatenated per position; NHWC here)."""
    num_feats: int = 128
    row_num_embed: int = 50
    col_num_embed: int = 50

    @nn.compact
    def __call__(self, b: int, h: int, w: int) -> jnp.ndarray:
        row = nn.Embed(self.row_num_embed, self.num_feats,
                       name='row_embed')(jnp.arange(h))      # (h, f)
        col = nn.Embed(self.col_num_embed, self.num_feats,
                       name='col_embed')(jnp.arange(w))      # (w, f)
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None, :, :], (h, w, self.num_feats)),
            jnp.broadcast_to(row[:, None, :], (h, w, self.num_feats)),
        ], axis=-1)
        return jnp.broadcast_to(pos[None], (b, h, w, 2 * self.num_feats))
