"""Shared 2x2 bilinear patch table.

TPU gathers pay per ROW, not per byte: zero-padding a feature map by
one pixel and channel-stacking the four shifted views makes every
bilinear sample ONE (4C)-wide row instead of four C-wide rows — 4x
fewer gather rows, and out-of-bounds corners read the zero pad so no
per-corner masks are needed (only a fully-outside clamp mask). This
idiom backs deformable attention (ops/msda_pallas.py), grid sampling
(models/utils/transformer.py), RoIAlign (ops/roi_align.py) and
deformable conv (models/deform_conv.py); the table construction lives
here so the corner order [TL, TR, BL, BR] and padding convention stay
consistent.
"""
from __future__ import annotations

import jax.numpy as jnp


def bilinear_patch_table(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H+1, W+1, 4C): cell (i, j) of the result
    holds the four bilinear corners [TL, TR, BL, BR] of the sample
    whose top-left integer coordinate is (i-1, j-1) in ``x`` (i.e.
    index with clipped ``floor(coord) + 1``), zero outside."""
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.concatenate([
        pad[:, :-1, :-1], pad[:, :-1, 1:],
        pad[:, 1:, :-1], pad[:, 1:, 1:]], axis=-1)
