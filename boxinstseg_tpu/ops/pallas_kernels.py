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
