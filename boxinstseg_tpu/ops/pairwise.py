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
    log_fg, log_bg = _log_probs(mask_logits)
    v = valid.astype(mask_logits.dtype)[..., None, None]
    base_w = bitmasks * v                                 # (B, K, H, W)
    num = jnp.float32(0.0)
    den = jnp.float32(0.0)
    for k, (dy, dx) in enumerate(neighbor_offsets(kernel_size, dilation)):
        # zero-padded log-prob unfold (see compute_pairwise_term)
        nb_fg = shift2d(log_fg, dy, dx, h_axis=2)
        nb_bg = shift2d(log_bg, dy, dx, h_axis=2)
        log_same = jnp.logaddexp(log_fg + nb_fg, log_bg + nb_bg)
        gate = (color_sim[:, k] >= color_thresh).astype(mask_logits.dtype)
        w = base_w * gate[:, None]                        # (B, K, H, W)
        num = num + jnp.sum(-log_same * w)
        den = den + jnp.sum(w)
    return num / jnp.maximum(den, 1.0)
