"""Chan-Vese level-set losses and the Local Consistency Module.

Re-derivation of the reference's level-set energy (reference:
mmdet/models/losses/levelset_loss.py:8-127) in jnp:

- ``region_levelset``: two-region Chan-Vese energy where the foreground /
  background mean intensities are soft averages weighted by the predicted
  phi (interior) and 1-phi (exterior).
- ``length_regularization``: total-variation curve-length term.
- ``LocalConsistencyModule`` (LCM): affinity-propagated refinement of phi
  over dilated 3x3 neighborhoods, iterated a fixed number of times —
  pure stencil ops that XLA fuses on TPU.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ...ops.color import neighbor_offsets
from ...registry import LOSSES


def region_levelset(mask_score: jnp.ndarray, lst_target: jnp.ndarray
                    ) -> jnp.ndarray:
    """Chan-Vese region energy.

    Args:
      mask_score: (N, 2, H, W) — channel 0 foreground phi, channel 1
        background (1 - phi).
      lst_target: (N, C, H, W) level-set input features (image or deep
        features), already cropped/normalized by the caller.
    Returns:
      (N,) per-instance energy, averaged over target channels.
    """
    fg = mask_score[:, 0:1]
    bg = mask_score[:, 1:2]
    fg_sum = jnp.clip(fg.sum(axis=(2, 3)), 1e-5)
    bg_sum = jnp.clip(bg.sum(axis=(2, 3)), 1e-5)
    interior = (fg * lst_target).sum(axis=(2, 3)) / fg_sum   # (N, C)
    exterior = (bg * lst_target).sum(axis=(2, 3)) / bg_sum
    in_term = (lst_target - interior[..., None, None]) ** 2
    ex_term = (lst_target - exterior[..., None, None]) ** 2
    energy = in_term * fg + ex_term * bg
    return energy.sum(axis=(1, 2, 3)) / lst_target.shape[1]


def length_regularization(mask_score: jnp.ndarray) -> jnp.ndarray:
    """Curve length of phi via abs forward differences; (N, C, H, W) -> (N,)."""
    gh = jnp.abs(mask_score[:, :, 1:, :] - mask_score[:, :, :-1, :])
    gw = jnp.abs(mask_score[:, :, :, 1:] - mask_score[:, :, :, :-1])
    return gh.sum(axis=(1, 2, 3)) + gw.sum(axis=(1, 2, 3))


@LOSSES.register_module()
class LevelsetLoss:
    def __init__(self, loss_weight: float = 1.0):
        self.loss_weight = loss_weight

    def __call__(self, mask_logits, targets, pixel_num):
        return self.loss_weight * region_levelset(
            mask_logits, targets) / pixel_num


def _replicate_shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """x[..., p + (dy,dx)] with replicate padding; spatial dims are last two."""
    h, w = x.shape[-2], x.shape[-1]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return x[..., ys, :][..., :, xs]


class LocalConsistencyModule:
    """Affinity-propagated phi refinement (reference levelset_loss.py:76-127).

    The affinity between a pixel and its 8 dilated neighbors is a Gaussian of
    the normalized image difference; phi is repeatedly replaced by the
    affinity-weighted average of its neighbors.
    """

    def __init__(self, dilations: Sequence[int] = (2,), num_iter: int = 10,
                 alpha: float = 0.3):
        self.dilations = list(dilations)
        self.num_iter = num_iter
        self.alpha = alpha

    def _neighbors(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, C, H, W) -> (N, C, 8*len(dilations), H, W), replicate pad."""
        outs = []
        for d in self.dilations:
            for dy, dx in neighbor_offsets(3, d):
                outs.append(_replicate_shift(x, dy, dx))
        return jnp.stack(outs, axis=2)

    def __call__(self, imgs: jnp.ndarray, pred_phis: jnp.ndarray
                 ) -> jnp.ndarray:
        nb_imgs = self._neighbors(imgs)                       # (N,C,K,H,W)
        diff = jnp.abs(nb_imgs - imgs[:, :, None])
        std = jnp.std(nb_imgs, axis=2, keepdims=True, ddof=1)
        aff = -((diff / (std + 1e-8) / self.alpha) ** 2)
        aff = aff.mean(axis=1, keepdims=True)                 # (N,1,K,H,W)
        aff = jax.nn.softmax(aff, axis=2)

        def step(phis, _):
            nb = self._neighbors(phis)
            return (nb * aff).sum(axis=2), None

        phis, _ = jax.lax.scan(step, pred_phis, None, length=self.num_iter)
        return phis


def local_consistency_loss(imgs, pred_phis, box_targets,
                           num_iter: int = 10, dilations=(2,)):
    """LCM loss: mean |refined - phi| inside box regions
    (reference levelset_loss.py:64-72)."""
    lcm = LocalConsistencyModule(dilations=dilations, num_iter=num_iter)
    refined = lcm(imgs, pred_phis)
    num = (jnp.abs(refined - pred_phis) * box_targets).sum()
    denom = jnp.clip(box_targets.sum(), 1.0)
    return num / denom
