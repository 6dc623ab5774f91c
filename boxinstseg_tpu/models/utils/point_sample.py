"""PointRend-style uncertainty point sampling (reference:
mmdet/models/utils/point_sample.py — get_uncertainty :6-29,
get_uncertain_point_coords_with_randomness :32-105; mmcv point_sample).

Static shapes throughout: the reference boolean-gathers top-uncertain
points; here the same top-k is expressed with take_along_axis so the
whole thing jits and vmaps. Masks keep the reference's (N, C, H, W)
layout (standalone utility)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def point_sample(inputs: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """mmcv point_sample: bilinear-sample (N, C, H, W) at (N, P, 2)
    [0, 1] xy coords, grid_sample align_corners=False semantics.
    Returns (N, C, P)."""
    from .transformer import _grid_sample_bilinear
    nhwc = inputs.transpose(0, 2, 3, 1)
    out = _grid_sample_bilinear(nhwc, points[..., 0], points[..., 1])
    return out.transpose(0, 2, 1)                        # (N, C, P)


def get_uncertainty(mask_pred: jnp.ndarray,
                    labels: jnp.ndarray) -> jnp.ndarray:
    """-|logit of the GT class| (reference :6-29). mask_pred:
    (N, C, ...); labels (N,)."""
    if mask_pred.shape[1] == 1:
        gt_logits = mask_pred
    else:
        idx = jnp.clip(labels, 0, mask_pred.shape[1] - 1)
        gt_logits = jnp.take_along_axis(
            mask_pred,
            idx.reshape(-1, 1, *([1] * (mask_pred.ndim - 2))), axis=1)
    return -jnp.abs(gt_logits)


def get_uncertain_point_coords_with_randomness(
        mask_pred: jnp.ndarray, labels: jnp.ndarray, num_points: int,
        oversample_ratio: float, importance_sample_ratio: float,
        rng: jax.Array) -> jnp.ndarray:
    """Oversample random points, keep the most uncertain fraction, fill
    the rest with fresh random points (reference :32-105). Returns
    (N, num_points, 2) in [0, 1]."""
    assert oversample_ratio >= 1
    assert 0 <= importance_sample_ratio <= 1
    n = mask_pred.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(rng)
    coords = jax.random.uniform(k1, (n, num_sampled, 2),
                                mask_pred.dtype)
    logits = point_sample(mask_pred, coords)             # (N, C, S)
    unc = get_uncertainty(logits, labels)[:, 0, :]       # (N, S)
    num_unc = int(importance_sample_ratio * num_points)
    num_rand = num_points - num_unc
    _, idx = jax.lax.top_k(unc, num_unc)                 # (N, num_unc)
    picked = jnp.take_along_axis(coords, idx[..., None].repeat(2, -1),
                                 axis=1)
    if num_rand > 0:
        rand = jax.random.uniform(k2, (n, num_rand, 2), mask_pred.dtype)
        picked = jnp.concatenate([picked, rand], axis=1)
    return picked
