"""Transformer bricks for Box2Mask (reference:
mmdet/models/utils/transformer.py + mmcv bricks).

All blocks are batch-first (B, L, C) flax modules with dropout omitted
(the shipped configs set every dropout to 0.0). Multi-scale deformable
attention — a CUDA kernel in the reference (mmcv ``ms_deform_attn``,
consumed at transformer.py:23) — is a gather + bilinear-sample formulation
in pure XLA: O(L * heads * levels * points) samples, grid_sample
align_corners=False semantics.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..layers import Dense, LayerNorm
from ...ops.patch import bilinear_patch_table


class MultiheadAttention(nn.Module):
    """Standard MHA with optional boolean attention mask (True = blocked),
    torch-compatible q/k/v/out projections."""
    embed_dims: int = 256
    num_heads: int = 8

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None):
        """query: (B, Lq, C); key/value: (B, Lk, C);
        attn_mask: (B, heads, Lq, Lk) bool or None."""
        c = self.embed_dims
        h = self.num_heads
        d = c // h
        q = Dense(c, name='q_proj')(query)
        k = Dense(c, name='k_proj')(key)
        v = Dense(c, name='v_proj')(value)
        b, lq, _ = q.shape
        lk = k.shape[1]
        q = q.reshape(b, lq, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, h, d).transpose(0, 2, 1, 3)
        scores = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(d)
        if attn_mask is not None:
            scores = jnp.where(attn_mask, -1e9, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, c)
        return Dense(c, name='out_proj')(out)


class FFN(nn.Module):
    embed_dims: int = 256
    feedforward_channels: int = 2048

    @nn.compact
    def __call__(self, x):
        y = Dense(self.feedforward_channels, name='fc1')(x)
        y = jax.nn.relu(y)
        y = Dense(self.embed_dims, name='fc2')(y)
        return x + y


def _grid_sample_bilinear(value: jnp.ndarray, loc_x: jnp.ndarray,
                          loc_y: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded bilinear sampling, grid_sample align_corners=False.

    value: (B, H, W, C); loc_x/loc_y: (B, N) normalized to [0, 1].
    Returns (B, N, C).
    """
    b, h, w, c = value.shape
    n = loc_x.shape[1]
    x = loc_x * w - 0.5
    y = loc_y * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    # ONE flat row-gather per corner: gathers with a leading batch dim
    # lower to a serial per-batch loop on TPU, and per-batch gathers pay
    # ~0.6 ms fixed latency each (the per-head MSDeformAttn loop spent
    # >0.5 s/step on them at LSJ sizes — profiled). A flat (b*h*w, c)
    # index take vectorizes fully.
    flat = value.reshape(b * h * w, c)
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]  # (b, 1)

    def gather(yy, xx):
        inb = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        idx = (base + yi * w + xi).reshape(-1)
        out = jnp.take(flat, idx, axis=0).reshape(b, n, c)
        return out * inb[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def _grid_sample_bilinear_patch(value: jnp.ndarray, loc_x: jnp.ndarray,
                                loc_y: jnp.ndarray,
                                weight: jnp.ndarray = None) -> jnp.ndarray:
    """Bilinear sampling via ONE flat row-gather of precomputed 2x2
    patches (grid_sample align_corners=False, zero padding) — the
    gather-heavy path of MultiScaleDeformableAttention.

    TPU gathers/scatters pay per-ROW, not per-byte: the 4-corner
    formulation costs 4 gather ops forward and 4 serialized scatter-adds
    backward per call (~0.7 s/step on the Box2Mask encoder, profiled).
    Zero-padding ``value`` by one pixel and stacking the 4 shifted views
    channel-wise makes every sample ONE (4c)-wide row; out-of-bounds
    corners read the zero pad, so no per-corner masks are needed (only a
    fully-outside clamp mask). 4x fewer gather/scatter rows, wider rows.

    value: (B, H, W, C); loc_x/loc_y: (B, N) normalized to [0, 1];
    weight: optional (B, N) per-sample scale folded into the corner
    weights (lets callers fuse e.g. attention weights into the one
    rows-tensor pass). Returns (B, N, C).
    """
    b, h, w, c = value.shape
    n = loc_x.shape[1]
    x = loc_x * w - 0.5
    y = loc_y * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    patch = bilinear_patch_table(value)
    flat = patch.reshape(b * (h + 1) * (w + 1), 4 * c)

    # sample fully outside [-1, h/w] x ... reads clamped (wrong) rows;
    # mask it (folded into the corner weights). Inside that range the
    # zero pad gives exact semantics.
    ok = ((x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1))
    xi = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)
    yi = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)
    base = (jnp.arange(b, dtype=jnp.int32) * ((h + 1) * (w + 1)))[:, None]
    idx = (base + yi * (w + 1) + xi).reshape(-1)
    rows = jnp.take(flat, idx, axis=0).reshape(b, n, 4, c)

    # all per-sample scalars live in the (b, n, 4) corner weights, so the
    # big rows tensor is touched in exactly ONE mul+reduce pass
    w4 = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                    wy * (1 - wx), wy * wx], axis=-1)    # (b, n, 4)
    w4 = w4 * ok[..., None]
    if weight is not None:
        w4 = w4 * weight[..., None]
    return (rows * w4[..., None].astype(rows.dtype)).sum(axis=2)


def _msda_offset_bias_init(num_heads, num_levels, num_points):
    """Directional grid init of sampling offsets (matches
    MultiScaleDeformableAttention.init_weights in mmcv)."""
    thetas = np.arange(num_heads) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)     # (h, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    for p in range(num_points):
        grid[:, :, p, :] *= p + 1
    return grid.reshape(-1).astype(np.float32)


class MultiScaleDeformableAttention(nn.Module):
    """Deformable attention over concatenated multi-level features."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4

    @nn.compact
    def __call__(self, query: jnp.ndarray, value: jnp.ndarray,
                 spatial_shapes: Sequence[Tuple[int, int]],
                 reference_points: jnp.ndarray) -> jnp.ndarray:
        """query: (B, L, C); value: (B, S, C) concat of levels;
        spatial_shapes: static [(h, w)] per level;
        reference_points: (B, L, 2) normalized (shared across levels)."""
        c = self.embed_dims
        h = self.num_heads
        d = c // h
        nl = self.num_levels
        npnt = self.num_points
        b, l, _ = query.shape

        v = Dense(c, name='value_proj')(value)
        offsets = Dense(
            h * nl * npnt * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: jnp.asarray(
                _msda_offset_bias_init(h, nl, npnt)),
            name='sampling_offsets')(query)                # (b, l, 2hnp)
        attn = Dense(h * nl * npnt, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name='attention_weights')(query)   # (b, l, hnp)

        # ---- channel-major transpose ONCE; everything after is static
        # row gathers on (b, C, l). The earlier (b, l, h, nl, p, 2)
        # formulation carried 2- and 4-lane minormost axes, each padded
        # to 128 lanes physically (~25 ms/step of 'data formatting' at
        # Box2Mask LSJ shapes, profiled). Channel order stays mmcv's
        # [head][level][point][xy] so checkpoints convert unchanged.
        offT = offsets.transpose(0, 2, 1)       # (b, h*nl*p*2, l)
        attT = attn.transpose(0, 2, 1).astype(jnp.float32)

        # softmax over each head's nl*p logits, channel-major: the
        # per-query GLOBAL max is subtracted instead of the per-head
        # max — mathematically identical (a per-query constant cancels
        # in numerator and denominator) — and the per-head sums ride a
        # block-diagonal 0/1 matmul instead of a minormost-12 reshape
        m = attT.max(axis=1, keepdims=True)
        e = jnp.exp(attT - m)
        same_head = np.kron(np.eye(h, dtype=np.float32),
                            np.ones((nl * npnt, nl * npnt), np.float32))
        den = jnp.einsum('cd,bdl->bcl', jnp.asarray(same_head), e)
        # clamp: if one head's logits sit ~88+ below the per-query
        # global max, numerator AND denominator underflow to 0 in f32
        # and 0/0 would NaN-poison training (the per-head-max softmax
        # this replaced guaranteed den >= 1)
        attnT = e / jnp.maximum(den, jnp.finfo(jnp.float32).tiny)

        # split the value into levels
        sizes = [int(hh * ww) for hh, ww in spatial_shapes]
        starts = np.cumsum([0] + sizes)
        grids = tuple(tuple(sh) for sh in spatial_shapes)

        # heads fold into the gather batch; samples go to the P-MAJOR
        # flat sampler (ops/msda_pallas.py msda_sample_psum_pm), whose
        # custom VJP runs d(value) as a windowed one-hot-matmul Pallas
        # kernel on TPU (the XLA scatter backward was ~24 ms/layer at
        # LSJ shapes).
        from ...ops.msda_pallas import msda_sample_psum_pm
        ref_x = jnp.tile(reference_points[..., 0], (1, npnt))  # (b, pl)
        ref_y = jnp.tile(reference_points[..., 1], (1, npnt))

        def flat_pm(t, chan_idx):
            """(b, C, l) channel rows -> (b, h, p*l) p-major planes."""
            g = jnp.take(t, jnp.asarray(chan_idx.reshape(-1)), axis=1)
            return g.reshape(b * h, npnt, l).reshape(b, h, npnt * l)

        out = jnp.zeros((b, l, h, d), v.dtype)
        for lvl, (hh, ww) in enumerate(spatial_shapes):
            vl = v[:, starts[lvl]:starts[lvl + 1]]
            vl = vl.reshape(b, hh, ww, h, d).transpose(0, 3, 1, 2, 4)
            vl = vl.reshape(b * h, hh, ww, d)
            # mmcv channel order: ((head*nl + lvl)*p + pp)*2 + coord
            rows = (np.arange(h)[:, None] * (nl * npnt)
                    + lvl * npnt + np.arange(npnt)[None, :])   # (h, p)
            off_x = flat_pm(offT, 2 * rows).astype(jnp.float32)
            off_y = flat_pm(offT, 2 * rows + 1).astype(jnp.float32)
            lx = (ref_x[:, None] + off_x / ww).reshape(b * h, -1)
            ly = (ref_y[:, None] + off_y / hh).reshape(b * h, -1)
            w_pm = flat_pm(attnT, rows).reshape(b * h, -1)
            smp = msda_sample_psum_pm(vl, lx, ly, w_pm, grids, npnt)
            out = out + smp.reshape(b, h, l, d).transpose(0, 2, 1, 3)
        out = out.reshape(b, l, c)
        return Dense(c, name='output_proj')(out)


class DetrTransformerEncoderLayer(nn.Module):
    """('self_attn'=MSDeformAttn, 'norm', 'ffn', 'norm') post-norm layer."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    feedforward_channels: int = 1024

    @nn.compact
    def __call__(self, x, pos, spatial_shapes, reference_points):
        attn = MultiScaleDeformableAttention(
            self.embed_dims, self.num_heads, self.num_levels,
            self.num_points, name='attn')(
            x + pos, x, spatial_shapes, reference_points)
        x = LayerNorm(name='norm1')(x + attn)
        x = FFN(self.embed_dims, self.feedforward_channels, name='ffn')(x)
        return LayerNorm(name='norm2')(x)


class TransformerEncoderLayer(nn.Module):
    """Plain ('self_attn', 'norm', 'ffn', 'norm') post-norm layer with
    full (non-deformable) self attention — the encoder brick inside the
    reference's fallback TransformerEncoderPixelDecoder
    (mmdet/models/plugins/pixel_decoder.py:159)."""
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 1024

    @nn.compact
    def __call__(self, x, pos, key_padding_mask=None):
        """x/pos: (B, L, C); key_padding_mask: (B, L) bool, True = pad."""
        mask = None
        if key_padding_mask is not None:
            mask = key_padding_mask[:, None, None, :]
        attn = MultiheadAttention(self.embed_dims, self.num_heads,
                                  name='attn')(
            x + pos, x + pos, x, attn_mask=mask)
        x = LayerNorm(name='norm1')(x + attn)
        x = FFN(self.embed_dims, self.feedforward_channels, name='ffn')(x)
        return LayerNorm(name='norm2')(x)


class DetrTransformerEncoder(nn.Module):
    """Stack of plain self-attention encoder layers (reference:
    mmdet/models/utils/transformer.py DetrTransformerEncoder)."""
    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 1024

    @nn.compact
    def __call__(self, x, pos, key_padding_mask=None):
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.embed_dims, self.num_heads,
                self.feedforward_channels, name=f'layers_{i}')(
                x, pos, key_padding_mask)
        return x


class DetrTransformerDecoder(nn.Module):
    """Stack of DETR decoder layers with optional per-layer outputs
    (reference: mmdet/models/utils/transformer.py DetrTransformerDecoder
    return_intermediate — used for deep supervision)."""
    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048
    return_intermediate: bool = True

    @nn.compact
    def __call__(self, query, key, value, query_pos, key_pos,
                 cross_attn_mask=None):
        intermediate = []
        for i in range(self.num_layers):
            query = DetrTransformerDecoderLayer(
                self.embed_dims, self.num_heads,
                self.feedforward_channels, name=f'layers_{i}')(
                query, key, value, query_pos, key_pos, cross_attn_mask)
            if self.return_intermediate:
                intermediate.append(query)
        return intermediate if self.return_intermediate else query


class DynamicConv(nn.Module):
    """Parameter-generated twin 1x1 convolutions over flattened RoI
    features (reference: mmdet/models/utils/transformer.py:1063-1167 —
    bmm-based dynamic interaction; kept for Sparse-R-CNN-style heads).

    __call__(param_feature (N, Cin), input_feature (N, H*W, Cin))
    -> (N, out) if with_proj else (N, H*W, out).
    """
    in_channels: int = 256
    feat_channels: int = 64
    out_channels: Optional[int] = None
    input_feat_shape: int = 7
    with_proj: bool = True

    @nn.compact
    def __call__(self, param_feature, input_feature):
        out_c = self.out_channels or self.in_channels
        n_in = self.in_channels * self.feat_channels
        n_out = out_c * self.feat_channels
        params = Dense(n_in + n_out, name='dynamic_layer')(param_feature)
        p_in = params[:, :n_in].reshape(-1, self.in_channels,
                                        self.feat_channels)
        p_out = params[:, n_in:].reshape(-1, self.feat_channels, out_c)
        feats = jnp.einsum('nlc,ncf->nlf', input_feature, p_in,
                           preferred_element_type=jnp.float32)
        feats = jax.nn.relu(LayerNorm(name='norm_in')(feats))
        feats = jnp.einsum('nlf,nfo->nlo', feats, p_out,
                           preferred_element_type=jnp.float32)
        feats = jax.nn.relu(LayerNorm(name='norm_out')(feats))
        if self.with_proj:
            feats = feats.reshape(feats.shape[0], -1)
            feats = Dense(out_c, name='fc_layer')(feats)
            feats = jax.nn.relu(LayerNorm(name='fc_norm')(feats))
        return feats


class DetrTransformerDecoderLayer(nn.Module):
    """('cross_attn', 'norm', 'self_attn', 'norm', 'ffn', 'norm')
    post-norm layer (reference: DetrTransformerDecoderLayer operation
    order in the Box2Mask config)."""
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048

    @nn.compact
    def __call__(self, query, key, value, query_pos, key_pos,
                 cross_attn_mask=None):
        ca = MultiheadAttention(self.embed_dims, self.num_heads,
                                name='cross_attn')(
            query + query_pos, key + key_pos, value,
            attn_mask=cross_attn_mask)
        query = LayerNorm(name='norm1')(query + ca)
        sa = MultiheadAttention(self.embed_dims, self.num_heads,
                                name='self_attn')(
            query + query_pos, query + query_pos, query)
        query = LayerNorm(name='norm2')(query + sa)
        query = FFN(self.embed_dims, self.feedforward_channels,
                    name='ffn')(query)
        return LayerNorm(name='norm3')(query)
