"""Associative Embedding (CornerNet) pull/push loss (reference:
mmdet/models/losses/ae_loss.py — ae_loss_per_image :11-73,
AssociativeEmbeddingLoss :76-105).

TPU-native redesign: the reference loops over a ragged python list of
matched corner coordinates; here matches are a padded ``(K, 2, 2)``
integer array plus a ``(K,)`` validity mask, gathers are vectorized and
the batch dimension is vmapped — fully static shapes under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import LOSSES


def ae_loss_per_image(tl_preds: jnp.ndarray, br_preds: jnp.ndarray,
                      match: jnp.ndarray, match_valid: jnp.ndarray):
    """One image's pull/push losses.

    tl_preds/br_preds: (H, W, C) embedding maps (NHWC convention).
    match: (K, 2, 2) int — [[tl_y, tl_x], [br_y, br_x]] per object, padded.
    match_valid: (K,) bool.
    """
    k = match.shape[0]
    c = tl_preds.shape[-1]
    # the reference flattens every embedding channel into the "object"
    # axis (`view(-1, 1)` + `cat`, ae_loss.py:40-50): N = #objects * C
    tl_e = tl_preds[match[:, 0, 0], match[:, 0, 1]].reshape(-1)  # (K*C,)
    br_e = br_preds[match[:, 1, 0], match[:, 1, 1]].reshape(-1)
    valid = jnp.repeat(match_valid, c).astype(tl_preds.dtype)    # (K*C,)
    n = valid.sum()
    me = (tl_e + br_e) / 2.0

    pull = (tl_e - me) ** 2 + (br_e - me) ** 2
    pull_loss = jnp.where(n > 0, (pull * valid).sum() / jnp.maximum(n, 1.0),
                          0.0)

    # push: margin - |me_i - me_j| over every flattened pair, zero
    # diagonal + invalid pairs (reference conf_mat, ae_loss.py:62-69)
    margin = 1.0
    conf = margin - jnp.abs(me[:, None] - me[None, :])
    pair_w = valid[:, None] * valid[None, :] * \
        (1.0 - jnp.eye(k * c, dtype=tl_preds.dtype))
    push = jax.nn.relu(conf) * pair_w
    push_loss = jnp.where(
        n > 1, push.sum() / jnp.maximum(n * (n - 1.0), 1.0), 0.0)
    return pull_loss, push_loss


@LOSSES.register_module()
class AssociativeEmbeddingLoss:
    """Batched AE loss; returns (pull, push) sums over the batch like the
    reference forward (ae_loss.py:96-105)."""

    def __init__(self, pull_weight: float = 0.25,
                 push_weight: float = 0.25):
        self.pull_weight = pull_weight
        self.push_weight = push_weight

    def __call__(self, pred, target, match, match_valid):
        pulls, pushes = jax.vmap(ae_loss_per_image)(pred, target, match,
                                                    match_valid)
        return self.pull_weight * pulls.sum(), \
            self.push_weight * pushes.sum()
