"""CenterNet/CornerNet gaussian heatmap utilities (reference:
mmdet/models/utils/gaussian_target.py — gaussian2D :8-29,
gen_gaussian_target :32-65, gaussian_radius :68-155, get_local_maximum
:190-204, get_topk_from_heatmap :207-231, gather_feat :234-252,
transpose_and_gather_feat :255-268).

TPU-native redesign: the reference splats each gaussian through python
slicing into the heatmap; here the splat is a whole-map masked maximum,
so centers/radii may be traced values and the op vmaps over instances.
Heatmaps keep the reference's (B, C, H, W) layout — these are standalone
utilities, not tied to the NHWC model convention.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def gaussian2D(radius: int, sigma: float = 1.0,
               dtype=jnp.float32) -> jnp.ndarray:
    """(2r+1, 2r+1) gaussian kernel with tiny values zeroed
    (reference :8-29)."""
    x = jnp.arange(-radius, radius + 1, dtype=dtype)[None, :]
    y = jnp.arange(-radius, radius + 1, dtype=dtype)[:, None]
    h = jnp.exp(-(x * x + y * y) / (2 * sigma * sigma))
    eps = jnp.finfo(h.dtype).eps
    return jnp.where(h < eps * h.max(), 0.0, h)


def gen_gaussian_target(heatmap: jnp.ndarray, center, radius,
                        k: float = 1.0) -> jnp.ndarray:
    """Max-splat one gaussian of ``radius`` at ``center`` (x, y) onto a
    (H, W) heatmap (reference :32-65). ``center``/``radius`` may be
    traced; out-of-map parts are clipped exactly like the reference's
    window arithmetic."""
    height, width = heatmap.shape
    x, y = center
    diameter = 2 * radius + 1
    sigma = diameter / 6.0
    xs = jnp.arange(width, dtype=heatmap.dtype)
    ys = jnp.arange(height, dtype=heatmap.dtype)
    dx = xs[None, :] - x
    dy = ys[:, None] - y
    g = jnp.exp(-(dx * dx + dy * dy) / (2 * sigma * sigma))
    # gaussian2D zeroes sub-eps values against the full-kernel max (=1)
    g = jnp.where(g < jnp.finfo(heatmap.dtype).eps, 0.0, g)
    window = (jnp.abs(dx) <= radius) & (jnp.abs(dy) <= radius)
    return jnp.where(window, jnp.maximum(heatmap, g * k), heatmap)


def gaussian_radius(det_size, min_overlap: float):
    """Minimal gaussian radius keeping IoU >= min_overlap for a (h, w)
    box under the three CornerNet corner-shift cases (reference
    :68-187)."""
    height, width = det_size

    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(b1 ** 2 - 4 * a1 * c1)
    r1 = (b1 - sq1) / (2 * a1)

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(b2 ** 2 - 4 * a2 * c2)
    r2 = (b2 - sq2) / (2 * a2)

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(b3 ** 2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / (2 * a3)
    return jnp.minimum(r1, jnp.minimum(r2, r3))


def get_local_maximum(heat: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep only local-maximum pixels of a (B, C, H, W) heatmap
    (reference :190-204)."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (1, 1, kernel, kernel), (1, 1, 1, 1),
        [(0, 0), (0, 0), (pad, pad), (pad, pad)])
    return heat * (hmax == heat).astype(heat.dtype)


def get_topk_from_heatmap(scores: jnp.ndarray, k: int = 20
                          ) -> Tuple[jnp.ndarray, ...]:
    """Top-k over a (B, C, H, W) heatmap -> (scores, inds, clses, ys, xs)
    with inds flat over HxW (reference :207-231)."""
    batch, _, height, width = scores.shape
    topk_scores, topk_inds = jax.lax.top_k(
        scores.reshape(batch, -1), k)
    topk_clses = topk_inds // (height * width)
    topk_inds = topk_inds % (height * width)
    topk_ys = topk_inds // width
    topk_xs = (topk_inds % width).astype(scores.dtype)
    return (topk_scores, topk_inds, topk_clses,
            topk_ys.astype(scores.dtype), topk_xs)


def gather_feat(feat: jnp.ndarray, ind: jnp.ndarray,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gather (B, N, C) rows by (B, K) indices (reference :234-252).
    With ``mask``, rows are zeroed instead of compacted (static shape)."""
    out = jnp.take_along_axis(feat, ind[..., None].astype(jnp.int32)
                              .repeat(feat.shape[-1], -1), axis=1)
    if mask is not None:
        out = jnp.where(mask[..., None], out, 0.0)
    return out


def transpose_and_gather_feat(feat: jnp.ndarray, ind: jnp.ndarray
                              ) -> jnp.ndarray:
    """(B, C, H, W) + flat (B, K) spatial indices -> (B, K, C)
    (reference :255-268)."""
    b, c = feat.shape[0], feat.shape[1]
    flat = feat.reshape(b, c, -1).transpose(0, 2, 1)
    return gather_feat(flat, ind)
