"""Pallas TPU kernels for the BoxInst hot loss stencil.

``pairwise_loss_kernel`` fuses, in one VMEM pass per (image, instance-tile)
block, what the reference implements as a CUDA kernel + separate unfold
tensors (reference: mmdet/ops/pairwise/csrc/pairwise/pairwise.cu:38-66 and
the color-gated weighting at condinst_head.py:1316-1325):

  for each pixel p and each of the 8 dilated neighbors q:
      term(p, q) = -log( sigmoid(x_p)sigmoid(x_q)
                         + sigmoid(-x_p)sigmoid(-x_q) )     [log-space]
      weight(p, q) = [color_sim(p, q) >= thresh] * box_mask(p)
  out = sum(term * weight), sum(weight)

The kernel emits per-block partial (numerator, denominator) sums; the
caller reduces and divides. The backward pass reuses the XLA shifted-slice
formulation (autodiff through ``boxinst_pairwise_loss``) — the stencil is
memory-bound, so fusing the forward read path is where the win is.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .color import neighbor_offsets
from .pairwise import boxinst_pairwise_loss


def _pairwise_block_kernel(logits_ref, gate_ref, mask_ref, num_ref, den_ref,
                           *, offsets):
    """One (K_tile, H, W) instance block against the image's (8, H, W)
    color-similarity gates."""
    import jax.nn as jnn

    x = logits_ref[0]                         # (kt, H, W)
    log_fg = jnn.log_sigmoid(x)
    log_bg = jnn.log_sigmoid(-x)
    base_w = mask_ref[0]                      # (kt, H, W)

    h, w = x.shape[-2], x.shape[-1]
    num = jnp.float32(0.0)
    den = jnp.float32(0.0)
    for k, (dy, dx) in enumerate(offsets):
        # zero-padded LOG-PROB shift: an out-of-image neighbor has
        # log_fg = log_bg = 0 so its term vanishes (reference pairwise.cu:
        # `ls_py = is_y_pad ? 0 : _logsig(y)`, :43-44)
        def shift(a):
            pad = [(0, 0), (max(-dy, 0), max(dy, 0)),
                   (max(-dx, 0), max(dx, 0))]
            ap = jnp.pad(a, pad)
            return ap[:, max(dy, 0):max(dy, 0) + h,
                      max(dx, 0):max(dx, 0) + w]

        nb_fg = shift(log_fg)
        nb_bg = shift(log_bg)
        log_same = jnp.logaddexp(log_fg + nb_fg, log_bg + nb_bg)
        gate = gate_ref[0, k].astype(x.dtype)             # (H, W)
        wgt = base_w * gate[None]
        num = num + jnp.sum(-log_same * wgt)
        den = den + jnp.sum(wgt)
    from jax.experimental import pallas as pl
    i = pl.program_id(0)
    j = pl.program_id(1)
    num_ref[i, j] = num
    den_ref[i, j] = den


def pairwise_loss_forward_pallas(mask_logits: jnp.ndarray,
                                 color_sim: jnp.ndarray,
                                 bitmasks: jnp.ndarray,
                                 valid: jnp.ndarray,
                                 color_thresh: float = 0.3,
                                 kernel_size: int = 3,
                                 dilation: int = 2,
                                 k_tile: int = 1,
                                 interpret: bool = False
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused partial-sum forward. Shapes as in ``boxinst_pairwise_loss``:
    mask_logits (B, K, H, W); color_sim (B, 8, H, W); bitmasks (B, K, H, W);
    valid (B, K). Returns (num, den) scalars."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k, h, w = mask_logits.shape
    assert k % k_tile == 0, (k, k_tile)
    offsets = neighbor_offsets(kernel_size, dilation)
    masked = bitmasks * valid.astype(bitmasks.dtype)[..., None, None]

    gates = (color_sim >= color_thresh).astype(jnp.bfloat16)
    grid = (b, k // k_tile)
    kernel = functools.partial(_pairwise_block_kernel, offsets=offsets)
    # scalar per-block partials: whole (grid) arrays in SMEM, each grid
    # step writes its own (i, j) cell (tiny, disjoint writes)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    num, den = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, k_tile, h, w),
                         lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, len(offsets), h, w),
                         lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, k_tile, h, w),
                         lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=(scalar_spec, scalar_spec),
        out_shape=(
            jax.ShapeDtypeStruct(grid, jnp.float32),
            jax.ShapeDtypeStruct(grid, jnp.float32),
        ),
        interpret=interpret,
    )(mask_logits, gates, masked)
    return num.sum(), den.sum()


def _pairwise_grad_kernel(logits_ref, gate_ref, mask_ref, grad_ref,
                          *, offsets):
    """Fused analytic gradient: ONE VMEM pass over the block computes the
    full 8-offset gradient (see ops/pairwise.py _pairwise_bwd for the math;
    this is the Pallas dual of the reference's pairwise_nlog_backward,
    pairwise.cu:52-66 — center + neighbor contributions, zero-padded)."""
    import jax.nn as jnn

    x = logits_ref[0]                         # (kt, H, W)
    log_fg = jnn.log_sigmoid(x)
    log_bg = jnn.log_sigmoid(-x)
    s = jnn.sigmoid(x)
    base_w = mask_ref[0]
    h, w = x.shape[-2], x.shape[-1]

    def shift(a, dy, dx):
        pad = [(0, 0), (max(-dy, 0), max(dy, 0)),
               (max(-dx, 0), max(dx, 0))]
        ap = jnp.pad(a, pad)
        return ap[:, max(dy, 0):max(dy, 0) + h,
                  max(dx, 0):max(dx, 0) + w]

    grad = jnp.zeros_like(x)
    for k, (dy, dx) in enumerate(offsets):
        nb_fg = shift(log_fg, dy, dx)
        nb_bg = shift(log_bg, dy, dx)
        a = log_fg + nb_fg
        m = jnp.logaddexp(a, log_bg + nb_bg)
        p_a = jnp.exp(a - m)
        gate = gate_ref[0, k].astype(x.dtype)
        wgt = base_w * gate[None]
        grad = grad + wgt * (s - p_a)
        nb_s = shift(s, dy, dx)
        grad = grad + shift(wgt * (nb_s - p_a), -dy, -dx)
    grad_ref[0] = grad


def pairwise_grad_pallas(mask_logits, color_sim, bitmasks, valid,
                         color_thresh=0.3, kernel_size=3, dilation=2,
                         k_tile=1, interpret=False):
    """Unscaled gradient (caller multiplies by g / max(den, 1))."""
    from jax.experimental import pallas as pl

    b, k, h, w = mask_logits.shape
    assert k % k_tile == 0, (k, k_tile)
    offsets = neighbor_offsets(kernel_size, dilation)
    masked = bitmasks * valid.astype(bitmasks.dtype)[..., None, None]
    gates = (color_sim >= color_thresh).astype(jnp.bfloat16)
    kernel = functools.partial(_pairwise_grad_kernel, offsets=offsets)
    return pl.pallas_call(
        kernel,
        grid=(b, k // k_tile),
        in_specs=[
            pl.BlockSpec((1, k_tile, h, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, len(offsets), h, w), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, k_tile, h, w), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k_tile, h, w), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, k, h, w), mask_logits.dtype),
        interpret=interpret,
    )(mask_logits, gates, masked)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7))
def boxinst_pairwise_loss_pallas(mask_logits, color_sim, bitmasks, valid,
                                 color_thresh: float = 0.3,
                                 kernel_size: int = 3, dilation: int = 2,
                                 interpret: bool = False):
    """Drop-in replacement for ``boxinst_pairwise_loss`` with fused Pallas
    forward AND analytic backward: each direction is one VMEM pass over
    the instance blocks instead of 8 per-offset HBM traversals."""
    num, den = pairwise_loss_forward_pallas(
        mask_logits, color_sim, bitmasks, valid, color_thresh,
        kernel_size, dilation, interpret=interpret)
    return num / jnp.maximum(den, 1.0)


def _fwd(mask_logits, color_sim, bitmasks, valid, color_thresh,
         kernel_size, dilation, interpret):
    num, den = pairwise_loss_forward_pallas(
        mask_logits, color_sim, bitmasks, valid, color_thresh,
        kernel_size, dilation, interpret=interpret)
    return num / jnp.maximum(den, 1.0), \
        (mask_logits, color_sim, bitmasks, valid, den)


def _bwd(color_thresh, kernel_size, dilation, interpret, res, g):
    mask_logits, color_sim, bitmasks, valid, den = res
    grad = pairwise_grad_pallas(mask_logits, color_sim, bitmasks, valid,
                                color_thresh, kernel_size, dilation,
                                interpret=interpret)
    return grad * (g / jnp.maximum(den, 1.0)), None, None, None


boxinst_pairwise_loss_pallas.defvjp(_fwd, _bwd)


# --------------------------------------------------------------- CRF


def _crf_block_kernel(kern_ref, thresh_ref, bin_ref, tgt_ref, out_ref,
                      *, offsets, num_iter):
    """All ``num_iter`` mean-field rounds for one (K_tile, H, W) instance
    block, state resident in VMEM. The XLA formulation re-reads the
    padded state once per offset — ~840 MB of HBM traffic per round at
    DiscoBox bench shapes (1.2 ms/round); here the state never leaves
    VMEM, so the whole fixed point costs one read + one write of each
    operand (profiled 12.2 -> 2.3 ms for the 10-round loop)."""
    h, w = bin_ref.shape[-2], bin_ref.shape[-1]
    kern = kern_ref[0]                        # (9, H, W) f32
    thresh = thresh_ref[0]                    # (1, H, W)  0.5 * kv
    tgt = tgt_ref[0] > 0                      # (kt, H, W)

    def one_round(_, st):
        p = jnp.pad(st, ((0, 0), (1, 1), (1, 1)))
        s = jnp.zeros_like(st)
        for o, (dy, dx) in enumerate(offsets):
            s = s + p[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w] \
                * kern[o][None]
        keep = (s > thresh) & tgt
        return keep.astype(st.dtype)

    out_ref[0] = jax.lax.fori_loop(0, num_iter, one_round, bin_ref[0])


def crf_mean_field_pallas(kernel: jnp.ndarray, thresh: jnp.ndarray,
                          bin0: jnp.ndarray, targets: jnp.ndarray,
                          offsets, num_iter: int, k_tile: int = 4,
                          interpret: bool = False) -> jnp.ndarray:
    """Binary mean-field fixed point (DiscoBox pseudo-label CRF, no-iiu
    branch; reference: MeanField.forward, discobox_head.py:585-651 with
    the exp/compare update reduced to ``targets & (s > kv/2)``).

    kernel: (B, O, H, W) f32; thresh: (B, H, W) = 0.5 * masked kernel
    sum; bin0/targets: (B, K, H, W) f32 binary. Returns (B, K, H, W)."""
    from jax.experimental import pallas as pl

    b, k, h, w = bin0.shape
    pad_k = (-k) % k_tile
    if pad_k:
        bin0 = jnp.pad(bin0, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    kp = k + pad_k
    grid = (b, kp // k_tile)
    kern = functools.partial(_crf_block_kernel, offsets=tuple(offsets),
                             num_iter=num_iter)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, len(offsets), h, w), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, k_tile, h, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, k_tile, h, w), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k_tile, h, w), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, kp, h, w), bin0.dtype),
        compiler_params=None if interpret else _crf_compiler_params(),
        interpret=interpret,
    )(kernel.astype(jnp.float32), thresh[:, None], bin0, targets)
    return out[:, :k]


def _crf_compiler_params():
    # the unrolled 9-offset body keeps several (k_tile, H, W) temporaries
    # live; the 16 MB default scoped-vmem limit rejects bench shapes
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


# --------------------------------------------------------------- LCM


def _zshift(a, dy, dx):
    """Zero-padded shift: out[y, x] = a[y+dy, x+dx] (in-range else 0)."""
    h, w = a.shape[-2], a.shape[-1]
    pad = [(0, 0), (max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))]
    ap = jnp.pad(a, pad)
    return ap[:, max(dy, 0):max(dy, 0) + h, max(dx, 0):max(dx, 0) + w]


def _edge_plane(a, axis, last):
    """First/last row (axis=-2) or column (axis=-1) of ``a`` as a
    keepdims masked reduction. A direct ``a[:, h-1:h, :]`` slice sits at
    a non-zero sublane/lane offset, which Mosaic refuses to broadcast
    ("offset mismatch on non-concat dimension"); the masked sum lands
    the same values at offset 0."""
    n = a.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape[-2:],
                                   axis + 2)[None]
    sel = idx == (n - 1 if last else 0)
    return jnp.sum(jnp.where(sel, a, 0.0), axis=axis, keepdims=True)


def _clamp_masks(shape, dy, dx):
    """(row_clamped, col_clamped) source/target masks for a (dy, dx)
    clamped shift, or None for a zero component."""
    h, w = shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)[None]
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)[None]
    row_cl = (rows > h - 1 - dy) if dy > 0 else \
        (rows < -dy) if dy < 0 else None
    col_cl = (cols > w - 1 - dx) if dx > 0 else \
        (cols < -dx) if dx < 0 else None
    return rows, cols, row_cl, col_cl


def _rep_shift(a, dy, dx):
    """Replicate (clamped-index) shift: out[y, x] = a[clip(y+dy), clip(x+dx)].

    One combined zero-shift plus edge-plane fills. Every ``jnp.pad``
    here consumes an offset-0 operand (``a`` itself or a masked-reduce
    edge plane) — chaining pad -> slice -> pad trips Mosaic's
    "result/input offset mismatch on non-concat dimension" because the
    second pad concatenates an offset-carrying vector."""
    h, w = a.shape[-2], a.shape[-1]
    _, _, row_cl, col_cl = _clamp_masks((h, w), dy, dx)
    out = _zshift(a, dy, dx)
    if col_cl is not None:
        ecol = _edge_plane(a, -1, dx > 0)                  # (ct, h, 1)
        out = jnp.where(col_cl, _zshift(ecol, dy, 0), out)
    if row_cl is not None:
        erow = _edge_plane(a, -2, dy > 0)                  # (ct, 1, w)
        fill = _zshift(erow, 0, dx)
        if col_cl is not None:
            corner = _edge_plane(erow, -1, dx > 0)         # (ct, 1, 1)
            fill = jnp.where(col_cl, corner, fill)
        out = jnp.where(row_cl, fill, out)
    return out


def _rep_shift_adjoint(g, dy, dx):
    """Adjoint of ``_rep_shift``: scatter-add g[p] into clip(p + (dy, dx)).

    Separable form: adjoint(zero-shift) = opposite zero-shift, and each
    clamped tail folds onto its edge row/col as a masked-sum fill (the
    corner gets the doubly-clamped total). Same Mosaic constraint as
    ``_rep_shift``: pads only ever see offset-0 operands."""
    h, w = g.shape[-2], g.shape[-1]
    rows, cols, row_cl, col_cl = _clamp_masks((h, w), dy, dx)
    e_y = h - 1 if dy > 0 else 0
    e_x = w - 1 if dx > 0 else 0
    out = _zshift(g, -dy, -dx)
    if col_cl is not None:
        cs = jnp.sum(jnp.where(col_cl, g, 0.0), axis=-1, keepdims=True)
        out = out + jnp.where(cols == e_x, _zshift(cs, -dy, 0), 0.0)
    if row_cl is not None:
        rs = jnp.sum(jnp.where(row_cl, g, 0.0), axis=-2, keepdims=True)
        fill = _zshift(rs, 0, -dx)
        if col_cl is not None:
            # two single-axis reduces: a combined axis=(-2, -1) reduce
            # crashes Mosaic's layout inference (rank-1 implicit dim)
            corner = jnp.sum(jnp.sum(jnp.where(row_cl & col_cl, g, 0.0),
                                     axis=-2, keepdims=True),
                             axis=-1, keepdims=True)
            fill = fill + jnp.where(cols == e_x, corner, 0.0)
        out = out + jnp.where(rows == e_y, fill, 0.0)
    return out


def _lcm_block_kernel(aff_ref, phi_ref, out_ref, *, offsets, num_iter,
                      transpose):
    """All ``num_iter`` LCM refinement rounds for one (C_tile, H, W)
    channel block, state resident in VMEM.

    Forward round:   st[p] <- sum_k aff[k, p] * st[clip(p + off_k)]
    Transpose round: st[q] <- sum_k scatter_clip(aff[k] * st, off_k)
    (the cotangent recurrence of the forward — the refinement is linear
    in phi, so the backward is the same kernel with ``transpose=True``).

    The XLA formulation re-reads the full (L*K, H, W) state through TWO
    clamped-index gathers per offset per round (10 rounds x 8 offsets at
    Box2Mask's (1000, 96, 96) state = ~6 GB of gather traffic each way);
    here the state never leaves VMEM."""
    aff = aff_ref[0]                           # (K_off, H, W) f32

    def one_round(_, st):
        s = jnp.zeros_like(st)
        for k, (dy, dx) in enumerate(offsets):
            if transpose:
                s = s + _rep_shift_adjoint(aff[k][None] * st, dy, dx)
            else:
                s = s + aff[k][None] * _rep_shift(st, dy, dx)
        return s

    out_ref[0] = jax.lax.fori_loop(0, num_iter, one_round, phi_ref[0])


def lcm_refine_pallas(aff: jnp.ndarray, phi: jnp.ndarray, offsets,
                      num_iter: int, transpose: bool = False,
                      c_tile: int = 8, interpret: bool = False
                      ) -> jnp.ndarray:
    """Local Consistency Module refinement (reference
    levelset_loss.py:76-127) as a VMEM-resident Pallas kernel.

    aff: (B, K_off, H, W) f32 softmax affinities (shared across all of an
    image's channels); phi: (B, C, H, W) phi / cotangent channels.
    Returns (B, C, H, W) in phi's dtype. ``transpose=True`` applies the
    adjoint operator (the custom-VJP backward)."""
    from jax.experimental import pallas as pl

    b, c, h, w = phi.shape
    in_dtype = phi.dtype
    pad_c = (-c) % c_tile
    if pad_c:
        phi = jnp.pad(phi, ((0, 0), (0, pad_c), (0, 0), (0, 0)))
    cp = c + pad_c
    kern = functools.partial(_lcm_block_kernel, offsets=tuple(offsets),
                             num_iter=num_iter, transpose=transpose)
    out = pl.pallas_call(
        kern,
        grid=(b, cp // c_tile),
        in_specs=[
            pl.BlockSpec((1, len(offsets), h, w), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, c_tile, h, w), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c_tile, h, w), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, cp, h, w), jnp.float32),
        compiler_params=None if interpret else _crf_compiler_params(),
        interpret=interpret,
    )(aff.astype(jnp.float32), phi.astype(jnp.float32))
    return out[:, :c].astype(in_dtype)
