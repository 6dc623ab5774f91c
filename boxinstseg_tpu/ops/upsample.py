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


def _aligned_axis_phases(n: int, factor: int):
    """Static per-output-phase (shift, weight) decomposition of one
    aligned_bilinear axis: output position ``factor*q + ph`` reads
    ``(1-w)*x[q+s] + w*x[q+s+1]`` with (s, w) constant per phase ph."""
    half = factor // 2
    phases = []
    for ph in range(factor):
        i = ph - half              # out = factor*q + ph samples i/factor
        s, rem = divmod(i, factor)
        phases.append((s, rem / float(factor)))
    return phases


def _phase_upsample_axis(x, axis, phases):
    """Upsample one axis by len(phases) via static-slice lerps
    interleaved by reshape — no gathers: ``jnp.take`` with an
    iota-derived index vector lowers to a real gather whose backward is
    a serialized scatter on TPU (~9 ms/step on the BoxInst mask branch,
    profiled). ``phases``: per output phase (shift, lerp weight), with
    replicate-edge semantics (== the clipped-coordinate math)."""
    n = x.shape[axis]
    factor = len(phases)
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (1, 1)
    xp = jnp.pad(x, pad_width, mode='edge')

    def sl(shift):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(1 + shift, 1 + shift + n)
        return xp[tuple(idx)]

    outs = []
    for s, wgt in phases:
        lo, hi = sl(s), sl(s + 1)
        outs.append(lo if wgt == 0.0 else (1.0 - wgt) * lo + wgt * hi)
    ax = axis if axis >= 0 else x.ndim + axis
    y = jnp.stack(outs, axis=ax + 1)
    shape = list(x.shape)
    shape[ax] = n * factor
    return y.reshape(shape)


def aligned_bilinear(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Upsample (..., H, W, C) by an integer factor, AdelaiDet-aligned."""
    assert factor >= 1 and isinstance(factor, int)
    if factor == 1:
        return x
    phases = _aligned_axis_phases(x.shape[-3], factor)
    x = _phase_upsample_axis(x, x.ndim - 3, phases)
    x = _phase_upsample_axis(x, x.ndim - 2, phases)
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

    def halfpixel_phases(factor):
        # out f*q+ph samples coord q + (ph+0.5)/f - 0.5; replicate-edge
        # slices reproduce the clipped-coordinate math exactly
        phases = []
        for ph in range(factor):
            o = (ph + 0.5) / factor - 0.5
            s = -1 if o < 0 else 0
            phases.append((s, o - s))
        return phases

    # integer upsampling factors: static-slice phase lerps, no gathers
    if not align_corners:
        if oh % h == 0 and oh > h:
            x = _phase_upsample_axis(x, x.ndim - 3,
                                     halfpixel_phases(oh // h))
            h = oh
        if ow % w == 0 and ow > w:
            x = _phase_upsample_axis(x, x.ndim - 2,
                                     halfpixel_phases(ow // w))
            w = ow
        if (h, w) == (oh, ow):
            return x

    # General (non-integer / downsample) resize: each axis is a LINEAR map
    # with <=2 nonzeros per output row, applied as a small dense matmul.
    # The previous jnp.take formulation was a gather whose backward is a
    # serialized scatter on TPU (~25 ms/step of BoxLevelset's 96^2 tree
    # inputs + stride-4 targets, profiled); the matmul runs fwd AND bwd
    # on the MXU at trivial FLOPs. Weights are numpy compile-time
    # constants (static shapes) with the exact clipped-coordinate math.
    x = _resize_matmul_axis(x, oh, x.ndim - 3, align_corners)
    x = _resize_matmul_axis(x, ow, x.ndim - 2, align_corners)
    return x


@functools.lru_cache(maxsize=None)
def _axis_weight_matrix(n_in: int, n_out: int, align_corners: bool):
    """(n_out, n_in) f32 bilinear resampling matrix (torch interpolate
    coordinate math; rows have <=2 nonzeros summing to 1)."""
    import numpy as np
    out = np.arange(n_out, dtype=np.float64)
    if align_corners:
        coords = out * ((n_in - 1) / max(n_out - 1, 1))
    else:
        coords = np.clip((out + 0.5) * (n_in / n_out) - 0.5,
                         0.0, float(n_in - 1))
    q0 = np.floor(coords).astype(np.int64)
    q1 = np.minimum(q0 + 1, n_in - 1)
    r = coords - q0
    mat = np.zeros((n_out, n_in), np.float64)
    mat[out.astype(np.int64), q0] += 1.0 - r
    mat[out.astype(np.int64), q1] += r
    return mat.astype(np.float32)


def _resize_matmul_axis(x, n_out, axis, align_corners):
    n_in = x.shape[axis]
    if n_in == n_out:
        return x
    mat = jnp.asarray(_axis_weight_matrix(n_in, n_out, align_corners))
    moved = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum('...i,oi->...o', moved, mat,
                   preferred_element_type=jnp.float32)
    # f32 accumulation, but return the input dtype so both the matmul
    # and integer-phase paths agree on the result dtype
    return jnp.moveaxis(y, -1, axis).astype(x.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def avg_pool_stride(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Non-overlapping average pool of (..., H, W, C) with the given stride
    (reference: F.avg_pool2d in condinst_head.py:1400)."""
    if stride == 1:
        return x
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    assert h % stride == 0 and w % stride == 0, (h, w, stride)
    # one axis at a time: the joint (-4, -2) reduce lowers ~14x slower on
    # TPU at 3-channel image shapes (0.40 vs 0.028 ms on the BoxInst b8
    # canvas, measured) because both reduced axes fight the tiny lane dim
    x = x.reshape(lead + (h // stride, stride, w, c)).sum(-3)
    x = x.reshape(lead + (h // stride, w // stride, stride, c)).sum(-2)
    return x * (1.0 / (stride * stride))
