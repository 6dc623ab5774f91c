"""RoIAlign (reference consumer: mmcv.ops.RoIAlign used by DiscoBox
object crops, discobox_head.py:7,740-742, and BitmapMasks ops).

Gather-based bilinear implementation: fixed ``sampling_ratio`` points per
output bin (the reference's adaptive ratio-0 mode is data-dependent and
non-static; 2x2 matches its behavior for typical ROI sizes), aligned=True
coordinate convention (pixel-center offset -0.5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, out_size,
              sampling_ratio: int = 2, aligned: bool = True,
              spatial_scale: float = 1.0) -> jnp.ndarray:
    """feat: (B, H, W, C); rois: (N, 5) of (batch_idx, x1, y1, x2, y2) in
    feature coords / spatial_scale. Returns (N, oh, ow, C)."""
    oh, ow = (out_size, out_size) if isinstance(out_size, int) else out_size
    b, h, w, c = feat.shape
    n = rois.shape[0]
    batch_idx = rois[:, 0].astype(jnp.int32)
    boxes = rois[:, 1:] * spatial_scale
    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] - offset
    y1 = boxes[:, 1] - offset
    roi_w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-3)
    roi_h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-3)
    bin_w = roi_w / ow
    bin_h = roi_h / oh
    s = sampling_ratio

    # sample grid: (oh*s, ow*s) points per roi
    iy = (jnp.arange(oh * s) + 0.5) / s                    # in bin units
    ix = (jnp.arange(ow * s) + 0.5) / s
    ys = y1[:, None] + iy[None, :] * bin_h[:, None]        # (N, oh*s)
    xs = x1[:, None] + ix[None, :] * bin_w[:, None]        # (N, ow*s)

    feat_n = feat[batch_idx]                               # (N, H, W, C)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[:, :, None]
    wx = (xs - x0)[:, None, :]

    def gather(yy, xx):
        # yy: (N, oh*s); xx: (N, ow*s) integer coords
        inb_y = (yy >= 0) & (yy < h)
        inb_x = (xx >= 0) & (xx < w)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        g = jax.vmap(lambda f, a, bb: f[a][:, bb])(feat_n, yi, xi)
        return g * (inb_y[:, :, None] & inb_x[:, None, :])[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    vals = ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))            # (N,oh*s,ow*s,C)
    vals = vals.reshape(n, oh, s, ow, s, c)
    return vals.mean(axis=(2, 4))
