"""On-device color-space math for BoxInst's pairwise affinity.

The reference round-trips every training image through the host to call
``skimage.color.rgb2lab`` (reference: condinst_head.py:1413-1416). Here the
sRGB -> CIELab conversion is closed-form jnp so it stays on device, and the
dilated-neighborhood color similarity is computed per-offset with shifted
slices instead of materializing an unfold tensor.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# D65/2deg reference white used by skimage's default rgb2lab.
_XN, _YN, _ZN = 0.95047, 1.0, 1.08883

# numpy at module scope: creating a jnp array at import time would
# initialize the XLA backend before jax.distributed.initialize can run
_RGB2XYZ = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
], dtype=np.float32)


def srgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """Convert (..., 3) sRGB in [0, 1] to CIELab (D65).

    Matches skimage.color.rgb2lab numerically (inverse-gamma, XYZ matrix,
    f(t) with the 0.008856 cube-root branch).
    """
    rgb = rgb.astype(jnp.float32)
    linear = jnp.where(rgb > 0.04045,
                       ((rgb + 0.055) / 1.055) ** 2.4,
                       rgb / 12.92)
    xyz = linear @ _RGB2XYZ.T
    xyz = xyz / jnp.array([_XN, _YN, _ZN], dtype=jnp.float32)

    eps = 0.008856451679035631  # (6/29)**3
    kappa = 7.787037037037035   # (29/6)**2 / 3 scaled form used by skimage
    f = jnp.where(xyz > eps, jnp.cbrt(xyz), kappa * xyz + 16.0 / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def srgb_uint8_to_lab(rgb_255: jnp.ndarray) -> jnp.ndarray:
    """Reference-parity path: images are truncated to uint8 before rgb2lab
    (condinst_head.py:1413 calls ``.byte()`` on the avg-pooled image)."""
    rgb = jnp.clip(jnp.floor(rgb_255), 0.0, 255.0) / 255.0
    return srgb_to_lab(rgb)


def neighbor_offsets(kernel_size: int, dilation: int
                     ) -> List[Tuple[int, int]]:
    """The K^2-1 (dy, dx) offsets of ``unfold_wo_center`` in row-major order
    (reference: condinst_head.py:190-224)."""
    half = kernel_size // 2
    offsets = []
    for ky in range(-half, half + 1):
        for kx in range(-half, half + 1):
            if ky == 0 and kx == 0:
                continue
            offsets.append((ky * dilation, kx * dilation))
    return offsets


def shift2d(x: jnp.ndarray, dy: int, dx: int, h_axis: int) -> jnp.ndarray:
    """value[p] = x[p + (dy, dx)] with zero padding outside; spatial axes are
    (h_axis, h_axis+1)."""
    pad = [(0, 0)] * x.ndim
    pad[h_axis] = (max(-dy, 0), max(dy, 0))
    pad[h_axis + 1] = (max(-dx, 0), max(dx, 0))
    xp = jnp.pad(x, pad)
    h, w = x.shape[h_axis], x.shape[h_axis + 1]
    idx = [slice(None)] * x.ndim
    idx[h_axis] = slice(max(dy, 0), max(dy, 0) + h)
    idx[h_axis + 1] = slice(max(dx, 0), max(dx, 0) + w)
    return xp[tuple(idx)]


def image_color_similarity(lab: jnp.ndarray, valid_mask: jnp.ndarray,
                           kernel_size: int = 3, dilation: int = 2
                           ) -> jnp.ndarray:
    """Per-offset Lab color similarity, masked by neighbor validity.

    Args:
      lab: (B, H, W, 3) CIELab image.
      valid_mask: (B, H, W) 1.0 inside the un-padded image region.
    Returns:
      (B, K^2-1, H, W): exp(-||lab[p] - lab[p+o]|| * 0.5) * valid[p+o]
      (reference: get_image_color_similarity, condinst_head.py:227-246).
    """
    sims = []
    for dy, dx in neighbor_offsets(kernel_size, dilation):
        nb = shift2d(lab, dy, dx, h_axis=1)
        dist = jnp.linalg.norm(lab - nb, axis=-1)
        nb_valid = shift2d(valid_mask, dy, dx, h_axis=1)
        sims.append(jnp.exp(-dist * 0.5) * nb_valid)
    return jnp.stack(sims, axis=1)
