"""BoxInst pairwise affinity loss, TPU-native.

The reference uses a custom CUDA kernel with a hand-written backward
(reference: mmdet/ops/pairwise/csrc/pairwise/pairwise.cu:38-149) purely to
avoid materializing the unfolded (N, K^2-1, H, W) tensor. On TPU we compute
the same log-space quantity per neighbor offset with shifted slices and let
XLA fuse + autodiff; the fused accumulation form never materializes the
full unfold either.

Math (identical to condinst_head.py:86-114): with p = sigmoid(logit),
P(same) = p_i p_j + (1-p_i)(1-p_j); the term is -log P(same), evaluated in
log space via logaddexp for stability.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .color import neighbor_offsets, shift2d


def _log_probs(logits: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    log_fg = jax.nn.log_sigmoid(logits)
    log_bg = jax.nn.log_sigmoid(-logits)
    return log_fg, log_bg


def compute_pairwise_term(mask_logits: jnp.ndarray, kernel_size: int = 3,
                          dilation: int = 2) -> jnp.ndarray:
    """Full per-offset pairwise term.

    Args:
      mask_logits: (N, H, W) instance mask logits.
    Returns:
      (N, K^2-1, H, W) of -log P(same prediction) between each pixel and its
      dilated neighbor. Out-of-image neighbors see zero-padded logits,
      matching the reference's zero-padded unfold.
    """
    log_fg, log_bg = _log_probs(mask_logits)
    terms = []
    for dy, dx in neighbor_offsets(kernel_size, dilation):
        # the reference unfolds the LOG-PROBS with zero padding
        # (condinst_head.py:92-99): an out-of-image neighbor has
        # log_fg = log_bg = 0, so log_same = logaddexp(log_fg, log_bg) = 0
        # and the pairwise term vanishes at borders.
        nb_fg = shift2d(log_fg, dy, dx, h_axis=1)
        nb_bg = shift2d(log_bg, dy, dx, h_axis=1)
        log_same = jnp.logaddexp(log_fg + nb_fg, log_bg + nb_bg)
        terms.append(-log_same)
    return jnp.stack(terms, axis=1)


def pairwise_loss(mask_logits: jnp.ndarray, weights: jnp.ndarray,
                  kernel_size: int = 3, dilation: int = 2) -> jnp.ndarray:
    """Fused sum(pairwise_term * weights) / clamp(sum(weights), 1).

    Args:
      mask_logits: (N, H, W).
      weights: (N, K^2-1, H, W) — typically
        (color_similarity >= thresh) * gt_box_bitmask
        (reference: condinst_head.py:1316-1325).
    Returns: scalar loss.
    """
    log_fg, log_bg = _log_probs(mask_logits)
    num = jnp.float32(0.0)
    for k, (dy, dx) in enumerate(neighbor_offsets(kernel_size, dilation)):
        # zero-padded log-prob unfold (see compute_pairwise_term)
        nb_fg = shift2d(log_fg, dy, dx, h_axis=1)
        nb_bg = shift2d(log_bg, dy, dx, h_axis=1)
        log_same = jnp.logaddexp(log_fg + nb_fg, log_bg + nb_bg)
        num = num + jnp.sum(-log_same * weights[:, k])
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    return num / denom


def _pad_once(x, r):
    """Pad the two trailing spatial dims by r once; per-offset neighbors
    become static slices of this single buffer. One pad instead of one per
    offset — measured 27x faster under XLA (pads block fusion; slices
    don't)."""
    pad = [(0, 0)] * (x.ndim - 2) + [(r, r), (r, r)]
    return jnp.pad(x, pad)


def _slice_at(xp, dy, dx, r, h, w):
    """xp[..., r+dy : r+dy+h, r+dx : r+dx+w] with static bounds."""
    start = (0,) * (xp.ndim - 2) + (r + dy, r + dx)
    limit = xp.shape[:-2] + (r + dy + h, r + dx + w)
    return jax.lax.slice(xp, start, limit)


def _pairwise_num_den(mask_logits, color_sim, bitmasks, valid,
                      color_thresh, kernel_size, dilation):
    """(numerator, denominator) of the weighted pairwise loss."""
    h, w = mask_logits.shape[-2:]
    r = (kernel_size // 2) * dilation
    log_fg, log_bg = _log_probs(mask_logits)
    fg_p = _pad_once(log_fg, r)
    bg_p = _pad_once(log_bg, r)
    v = valid.astype(mask_logits.dtype)[..., None, None]
    base_w = bitmasks * v
    num = jnp.float32(0.0)
    den = jnp.float32(0.0)
    for k, (dy, dx) in enumerate(neighbor_offsets(kernel_size, dilation)):
        nb_fg = _slice_at(fg_p, dy, dx, r, h, w)
        nb_bg = _slice_at(bg_p, dy, dx, r, h, w)
        log_same = jnp.logaddexp(log_fg + nb_fg, log_bg + nb_bg)
        gate = (color_sim[:, k] >= color_thresh).astype(mask_logits.dtype)
        w_ = base_w * gate[:, None]
        num = num + jnp.sum(-log_same * w_)
        den = den + jnp.sum(w_)
    return num, den


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def boxinst_pairwise_loss(mask_logits: jnp.ndarray,
                          color_sim: jnp.ndarray,
                          bitmasks: jnp.ndarray,
                          valid: jnp.ndarray,
                          color_thresh: float = 0.3,
                          kernel_size: int = 3,
                          dilation: int = 2) -> jnp.ndarray:
    """Memory-lean BoxInst pairwise loss over sampled instances.

    Never materializes the (B, K, K^2-1, H, W) weight tensor: per offset it
    combines the per-image color gate with the per-instance box bitmask on
    the fly (reference math: condinst_head.py:1316-1325).

    Args:
      mask_logits: (B, K, H, W) sampled-instance mask logits.
      color_sim: (B, K^2-1, H, W) per-image color similarity.
      bitmasks: (B, K, H, W) GT box bitmasks of the sampled instances.
      valid: (B, K) bool sample validity.
    """
    num, den = _pairwise_num_den(mask_logits, color_sim, bitmasks, valid,
                                 color_thresh, kernel_size, dilation)
    return num / jnp.maximum(den, 1.0)


def _pairwise_fwd(mask_logits, color_sim, bitmasks, valid,
                  color_thresh, kernel_size, dilation):
    num, den = _pairwise_num_den(mask_logits, color_sim, bitmasks, valid,
                                 color_thresh, kernel_size, dilation)
    return num / jnp.maximum(den, 1.0), \
        (mask_logits, color_sim, bitmasks, valid, den)


def _pairwise_bwd(color_thresh, kernel_size, dilation, res, g):
    """Analytic backward (the XLA dual of the reference's hand-written
    pairwise_nlog_backward, pairwise.cu:52-66).

    With s = sigmoid(x), pA = exp(lf(p) + lf(q) - logaddexp(...)):
      d(-log_same)/dx_p = s(p) - pA,   d/dx_q = s(q) - pA.
    Per offset o the gradient at p is therefore
      w_o(p) * (s(p) - pA_o(p))  +  w_o(p-o) * (s(p) - pA_o(p-o)),
    accumulated by shifting the neighbor-side term back by -o. Out-of-image
    neighbors have lf = lb = 0, making pA = s and the contribution 0 —
    matching the zero-padded forward. Nothing from the forward needs to be
    saved except the inputs; recomputation is a handful of fused stencils.
    """
    mask_logits, color_sim, bitmasks, valid, den = res
    h, w = mask_logits.shape[-2:]
    r = (kernel_size // 2) * dilation
    log_fg, log_bg = _log_probs(mask_logits)
    s = jax.nn.sigmoid(mask_logits)
    fg_p = _pad_once(log_fg, r)
    bg_p = _pad_once(log_bg, r)
    s_p = _pad_once(s, r)
    v = valid.astype(mask_logits.dtype)[..., None, None]
    base_w = bitmasks * v
    grad = jnp.zeros_like(mask_logits)
    for k, (dy, dx) in enumerate(neighbor_offsets(kernel_size, dilation)):
        nb_fg = _slice_at(fg_p, dy, dx, r, h, w)
        nb_bg = _slice_at(bg_p, dy, dx, r, h, w)
        a = log_fg + nb_fg
        m = jnp.logaddexp(a, log_bg + nb_bg)
        p_a = jnp.exp(a - m)
        gate = (color_sim[:, k] >= color_thresh).astype(mask_logits.dtype)
        w_ = base_w * gate[:, None]
        grad = grad + w_ * (s - p_a)                     # p as center
        nb_s = _slice_at(s_p, dy, dx, r, h, w)
        grad = grad + shift2d(w_ * (nb_s - p_a), -dy, -dx, h_axis=2)
    scale = g / jnp.maximum(den, 1.0)
    return (grad * scale, None, None, None)


boxinst_pairwise_loss.defvjp(_pairwise_fwd, _pairwise_bwd)
