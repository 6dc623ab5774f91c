"""SOLO grid-assignment golden test vs the reference's own
solo_target_single (box_solov2_head.py:390-477), AST-extracted and run
with mocked mmcv.imrescale — covers scale-range gating, mass-center cell,
sigma-shrunk extent intersection, the +-1-cell clipping, and the
last-GT-wins overwrite order."""
import types

import numpy as np
import pytest

import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from ref_oracle import load_ref_method, ref_available, to_np, to_torch

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason='reference tree not mounted')

BOXSOLO = 'mmdet/models/dense_heads/box_solov2_head.py'


class _MockMMCV:
    @staticmethod
    def imrescale(mask, scale):
        import cv2
        h, w = mask.shape
        nw, nh = int(w * scale + 0.5), int(h * scale + 0.5)
        return cv2.resize(mask, (nw, nh),
                          interpolation=cv2.INTER_NEAREST)


def test_golden_solo_assignment(rng):
    import torch
    import torch.nn.functional as F
    from scipy import ndimage
    from boxinstseg_tpu.core.targets.solo import solo_targets

    H, W = 128, 128                      # canvas (stride-4 map 32x32)
    num_grids = [12, 8, 6]
    strides = [8, 16, 32]
    scale_ranges = [(1, 48), (24, 96), (48, 2048)]
    sigma = 0.2
    num_classes = 4
    featmap_sizes = [(H // 4, W // 4)] * len(num_grids)

    single = load_ref_method(
        BOXSOLO, 'BoxSOLOv2Head', 'solo_target_single',
        extra_ns=dict(mmcv=_MockMMCV(), ndimage=ndimage, F=F))

    # overlapping GTs spanning multiple scale ranges; same-cell collisions
    boxes = np.array([[10, 10, 50, 52],      # small-medium
                      [12, 14, 52, 50],      # overlaps #0 (same cells)
                      [20, 20, 110, 116],    # large
                      [70, 70, 90, 94]], np.float32)
    labels = np.array([1, 2, 0, 3], np.int32)
    masks = np.zeros((4, H, W), np.uint8)
    for g, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
        masks[g, y1:y2, x1:x2] = 1
    # make mass centers non-trivial (L-shaped mask for GT 0)
    masks[0, 10:30, 30:50] = 0

    self = types.SimpleNamespace(
        scale_ranges=scale_ranges, strides=strides,
        seg_num_grids=num_grids, num_classes=num_classes, sigma=sigma)
    norm_img = torch.zeros(3, H // 4, W // 4)
    lst = torch.zeros(5, H // 4, W // 4)
    ins_l, cate_l, ind_l, _, _ = single(
        self, to_torch(boxes), to_torch(labels.astype(np.int64)),
        masks, norm_img, lst, featmap_sizes=featmap_sizes)

    got = solo_targets(
        jnp.asarray(boxes)[None], jnp.asarray(labels)[None],
        jnp.ones((1, 4), bool),
        jnp.asarray(masks[None, :, ::4, ::4]),   # stride-4 subsampled
        (H, W), num_grids, scale_ranges, sigma, num_classes,
        mask_stride=4)

    start = 0
    for lvl, S in enumerate(num_grids):
        want_cate = to_np(cate_l[lvl]).reshape(-1)
        got_cate = np.asarray(got.cate_labels[0, start:start + S * S])
        np.testing.assert_array_equal(
            got_cate, want_cate,
            err_msg=f'level {lvl} category grid diverges')
        # positive-cell sets must match exactly
        want_pos = to_np(ind_l[lvl])
        got_pos = np.asarray(got.cell_gt[0, start:start + S * S]) >= 0
        np.testing.assert_array_equal(got_pos, want_pos,
                                      err_msg=f'level {lvl} positives')
        start += S * S
