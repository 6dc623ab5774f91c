"""Resizing ops (NHWC) matching the reference's exact interpolation math.

``aligned_bilinear`` reproduces the AdelaiDet-style upsample used throughout
the reference (reference: mmdet/models/dense_heads/condinst_head.py:146-167):
replicate-pad by one on the bottom/right, bilinearly resize with
align_corners=True to ``factor*h+1`` x ``factor*w+1``, replicate-pad the
top/left by ``factor//2`` and crop. Here that collapses to a closed-form
gather + lerp along each spatial axis, which XLA fuses well.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _aligned_axis_indices(n: int, factor: int):
    """Gather indices and lerp weights for one axis of aligned_bilinear."""
    out = jnp.arange(n * factor)
    # top/left replicate pad by factor//2, then sample interp grid at i/factor
    i = jnp.maximum(out - factor // 2, 0)
    q = i // factor
    r = (i % factor).astype(jnp.float32) / float(factor)
    q0 = jnp.clip(q, 0, n - 1)
    q1 = jnp.clip(q + 1, 0, n - 1)  # replicate pad on the far edge
    return q0, q1, r


def aligned_bilinear(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Upsample (..., H, W, C) by an integer factor, AdelaiDet-aligned."""
    assert factor >= 1 and isinstance(factor, int)
    if factor == 1:
        return x
    h, w = x.shape[-3], x.shape[-2]

    q0, q1, r = _aligned_axis_indices(h, factor)
    r = r.reshape((-1,) + (1,) * (x.ndim - 3 + 2))[..., 0]
    r = r.reshape((-1, 1, 1))
    x = (1.0 - r) * jnp.take(x, q0, axis=-3) + r * jnp.take(x, q1, axis=-3)

    q0, q1, r = _aligned_axis_indices(w, factor)
    r = r.reshape((-1, 1))
    x = (1.0 - r) * jnp.take(x, q0, axis=-2) + r * jnp.take(x, q1, axis=-2)
    return x


def interpolate_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = False
                         ) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) to ``out_hw``.

    align_corners=False matches torch.nn.functional.interpolate's default
    (half-pixel centers); align_corners=True matches the corner-aligned grid.
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x

    def axis_coords(n_in, n_out):
        out = jnp.arange(n_out, dtype=jnp.float32)
        if align_corners:
            scale = (n_in - 1) / max(n_out - 1, 1)
            return out * scale
        scale = n_in / n_out
        return jnp.clip((out + 0.5) * scale - 0.5, 0.0, float(n_in - 1))

    def interp_axis(x, coords, axis):
        q0 = jnp.floor(coords).astype(jnp.int32)
        q1 = jnp.minimum(q0 + 1, x.shape[axis] - 1)
        r = coords - q0.astype(jnp.float32)
        shape = [1] * x.ndim
        shape[axis] = -1
        r = r.reshape(shape)
        return (1.0 - r) * jnp.take(x, q0, axis=axis) + r * jnp.take(
            x, q1, axis=axis)

    x = interp_axis(x, axis_coords(h, oh), x.ndim - 3)
    x = interp_axis(x, axis_coords(w, ow), x.ndim - 2)
    return x


@functools.partial(jax.jit, static_argnums=(1,))
def avg_pool_stride(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Non-overlapping average pool of (..., H, W, C) with the given stride
    (reference: F.avg_pool2d in condinst_head.py:1400)."""
    if stride == 1:
        return x
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    assert h % stride == 0 and w % stride == 0, (h, w, stride)
    x = x.reshape(lead + (h // stride, stride, w // stride, stride, c))
    return x.mean(axis=(-4, -2))
