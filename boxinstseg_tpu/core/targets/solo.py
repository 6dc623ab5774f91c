"""Batched SOLOv2-style grid target assignment with static shapes.

Re-derivation of the reference's per-image python/scipy assignment
(reference: box_solov2_head.py:395-477 solo_target_single, and the
identical scheme in discobox_head.py:1442-1529): a GT is assigned to every
grid cell within +-1 of its mass-center cell, intersected with the
sigma-shrunk box extent, on each level whose scale range contains
sqrt(area). The scipy ``center_of_mass`` + host loops become vectorized
jnp over (B, G) with validity masks; the center of mass is computed on the
device from the stride-subsampled GT masks.
"""
from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SoloTargets(NamedTuple):
    cate_labels: jnp.ndarray   # (B, Pc) int32 labels per grid cell (bg = C)
    cell_gt: jnp.ndarray       # (B, Pc) int32 assigned GT slot (-1 = none)
    num_pos: jnp.ndarray       # () total positive cells in batch
    level_ids: jnp.ndarray     # (Pc,) level of each flattened cell


def mask_centers_areas(gt_masks: jnp.ndarray, mask_stride: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, G, Hs, Ws) uint8 -> mass centers (y, x) in canvas coords and
    full-resolution areas (approximately; masks are stride-subsampled)."""
    m = gt_masks.astype(jnp.float32)
    hs, ws = m.shape[2], m.shape[3]
    ys = jnp.arange(hs, dtype=jnp.float32) * mask_stride
    xs = jnp.arange(ws, dtype=jnp.float32) * mask_stride
    tot = m.sum(axis=(2, 3))
    cy = (m.sum(axis=3) * ys).sum(axis=2) / jnp.maximum(tot, 1e-6)
    cx = (m.sum(axis=2) * xs).sum(axis=2) / jnp.maximum(tot, 1e-6)
    area = tot * (mask_stride ** 2)
    return cy, cx, area


def solo_targets(gt_bboxes: jnp.ndarray,
                 gt_labels: jnp.ndarray,
                 gt_valid: jnp.ndarray,
                 gt_masks: jnp.ndarray,
                 canvas_hw: Tuple[int, int],
                 num_grids: Sequence[int],
                 scale_ranges: Sequence[Tuple[float, float]],
                 sigma: float,
                 num_classes: int,
                 mask_stride: int = 4,
                 min_mask_area: float = 10.0) -> SoloTargets:
    """All-level grid assignment. Flattened cell order is level-major,
    row-major within each level (matching the reference's per-level concat).
    """
    B, G = gt_labels.shape
    H, W = canvas_hw
    cy, cx, mask_area = mask_centers_areas(gt_masks, mask_stride)

    gw = gt_bboxes[..., 2] - gt_bboxes[..., 0]
    gh = gt_bboxes[..., 3] - gt_bboxes[..., 1]
    gt_scale = jnp.sqrt(jnp.maximum(gw * gh, 0.0))
    half_w = 0.5 * gw * sigma
    half_h = 0.5 * gh * sigma

    cate_all: List[jnp.ndarray] = []
    gt_all: List[jnp.ndarray] = []
    lvl_ids: List[np.ndarray] = []
    for lvl, (S, (lo, hi)) in enumerate(zip(num_grids, scale_ranges)):
        hit = (gt_scale >= lo) & (gt_scale <= hi) & gt_valid
        hit &= mask_area >= min_mask_area

        def cell_of(coord, size):   # floor(coord / size * S)
            return jnp.floor(coord / size * S).astype(jnp.int32)

        coord_i = cell_of(cy, H)
        coord_j = cell_of(cx, W)
        top = jnp.maximum(jnp.maximum(cell_of(cy - half_h, H), 0),
                          coord_i - 1)
        down = jnp.minimum(jnp.minimum(cell_of(cy + half_h, H), S - 1),
                           coord_i + 1)
        left = jnp.maximum(jnp.maximum(cell_of(cx - half_w, W), 0),
                           coord_j - 1)
        right = jnp.minimum(jnp.minimum(cell_of(cx + half_w, W), S - 1),
                            coord_j + 1)

        ii = jnp.arange(S)[None, :, None, None]     # (1, S, 1, 1)
        jj = jnp.arange(S)[None, None, :, None]     # (1, 1, S, 1)
        in_cell = ((ii >= top[:, None, None, :]) &
                   (ii <= down[:, None, None, :]) &
                   (jj >= left[:, None, None, :]) &
                   (jj <= right[:, None, None, :]) &
                   hit[:, None, None, :])           # (B, S, S, G)
        # reference iterates GTs in order and overwrites -> last hit wins.
        gt_idx = jnp.arange(G)[None, None, None, :]
        best = jnp.where(in_cell, gt_idx, -1).max(axis=-1)   # (B, S, S)
        lbl = jnp.where(
            best >= 0,
            jnp.take_along_axis(gt_labels, jnp.maximum(best, 0).reshape(
                B, -1), axis=1).reshape(B, S, S),
            num_classes)
        cate_all.append(lbl.reshape(B, S * S))
        gt_all.append(best.reshape(B, S * S))
        lvl_ids.append(np.full(S * S, lvl, np.int32))

    cate_labels = jnp.concatenate(cate_all, axis=1).astype(jnp.int32)
    cell_gt = jnp.concatenate(gt_all, axis=1).astype(jnp.int32)
    num_pos = (cell_gt >= 0).sum()
    return SoloTargets(cate_labels=cate_labels, cell_gt=cell_gt,
                       num_pos=num_pos,
                       level_ids=jnp.asarray(np.concatenate(lvl_ids)))


def sample_positive_cells(cell_gt: jnp.ndarray, capacity: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pick up to ``capacity`` positive cells per image (deterministic,
    cell order — the reference keeps all positives; fixed capacity is the
    static-shape trade-off, sized so overflow is rare).

    Returns (cell_idx (B, K), gt_idx (B, K), valid (B, K)).
    """
    B, Pc = cell_gt.shape
    pos = cell_gt >= 0
    # order positives first, stable by cell index
    key = jnp.where(pos, jnp.arange(Pc)[None, :], Pc + jnp.arange(Pc))
    order = jnp.argsort(key, axis=1)[:, :capacity]          # (B, K)
    valid = jnp.take_along_axis(pos, order, axis=1)
    gt_idx = jnp.take_along_axis(cell_gt, order, axis=1)
    cell_idx = jnp.where(valid, order, 0).astype(jnp.int32)
    gt_idx = jnp.where(valid, gt_idx, 0).astype(jnp.int32)
    return cell_idx, gt_idx, valid
