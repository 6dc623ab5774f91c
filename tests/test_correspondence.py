"""Tests for the DiscoBox correspondence machinery + RoIAlign."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boxinstseg_tpu.ops.correspondence import (ObjectBank, bank_append,
                                               bank_retrieve,
                                               create_object_bank,
                                               info_nce_loss, pass_message,
                                               relu_l2_norm, sinkhorn,
                                               solve_correspondence)
from boxinstseg_tpu.ops.roi_align import roi_align


def test_roi_align_constant_region(rng):
    feat = np.zeros((1, 16, 16, 2), np.float32)
    feat[:, 4:12, 4:12, 0] = 3.0
    rois = jnp.asarray([[0, 4.0, 4.0, 12.0, 12.0]])
    out = np.asarray(roi_align(jnp.asarray(feat), rois, (4, 4)))
    np.testing.assert_allclose(out[0, 1:3, 1:3, 0], 3.0, atol=0.2)
    assert out[0, ..., 1].max() == 0


def test_roi_align_matches_loop_oracle(rng):
    """Flat patch-gather RoIAlign vs a direct per-sample numpy loop
    (mmcv aligned=True semantics: half-pixel offset, 2x2 samples/bin,
    zero outside)."""
    b, h, w, c = 2, 9, 11, 3
    feat = rng.randn(b, h, w, c).astype(np.float32)
    rois = np.array([
        [0, 1.3, 0.7, 7.9, 6.2],
        [1, -1.0, 2.0, 5.5, 10.5],     # partially out of bounds
        [0, 4.0, 4.0, 4.6, 4.4],       # tiny roi
    ], np.float32)
    oh = ow = 3
    s = 2
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               (oh, ow)))

    def sample(img, py, px):
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        wy, wx = py - y0, px - x0
        out = np.zeros(c)
        for yy, xx, ww in [(y0, x0, (1 - wy) * (1 - wx)),
                           (y0, x0 + 1, (1 - wy) * wx),
                           (y0 + 1, x0, wy * (1 - wx)),
                           (y0 + 1, x0 + 1, wy * wx)]:
            if 0 <= yy < h and 0 <= xx < w:
                out += ww * img[yy, xx]
        return out

    for r, (bi, x1, y1, x2, y2) in enumerate(rois):
        bw = max(x2 - x1, 1e-3) / ow
        bh = max(y2 - y1, 1e-3) / oh
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(c)
                for a in range(s):
                    for d in range(s):
                        py = y1 - 0.5 + (i + (a + 0.5) / s) * bh
                        px = x1 - 0.5 + (j + (d + 0.5) / s) * bw
                        acc += sample(feat[int(bi)], py, px)
                np.testing.assert_allclose(
                    got[r, i, j], acc / (s * s), rtol=1e-4, atol=1e-4,
                    err_msg=f'roi {r} bin ({i},{j})')


def test_sinkhorn_marginals(rng):
    b, n, m = 2, 6, 6
    cost = jnp.asarray(rng.rand(b, n, m).astype(np.float32))
    mu = jnp.ones((b, n)) / n
    nu = jnp.ones((b, m)) / m
    t = sinkhorn(mu, nu, cost, reg=0.1, num_iters=200)
    np.testing.assert_allclose(np.asarray(t.sum(2)), np.asarray(mu),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(t.sum(1)), np.asarray(nu),
                               atol=1e-3)


def test_pass_message_preserves_mass_structure():
    h = w = 4
    n = h * w
    t = jnp.zeros((1, n, n)).at[0, 5, 5].set(1.0)
    out = np.asarray(pass_message(t, (h, w)))
    # mass spreads along the diagonal displacements only
    assert out[0, 5, 5] > 0
    assert out[0, 6, 6] > 0   # d=(0,+1) both sides
    assert out[0, 5, 6] == 0  # off-diagonal displacement gets nothing


def test_solve_correspondence_identity(rng):
    """Matching an object against itself must produce ~identity assignment."""
    h = w = 7
    n = h * w
    f = relu_l2_norm(jnp.asarray(rng.rand(1, n, 16).astype(np.float32) * 2))
    cu, t = solve_correspondence(f, f, (h, w), num_iter=3)
    assign = np.asarray(t.argmax(2))[0]
    acc = (assign == np.arange(n)).mean()
    assert acc > 0.8, f'self-matching accuracy {acc}'
    loss = info_nce_loss(cu, t, jnp.asarray([True]))
    assert np.isfinite(float(loss))


def test_object_bank_ring_and_retrieve(rng):
    bank = create_object_bank(num_classes=3, len_queue=4, feat_hw=(7, 7),
                              mask_hw=(28, 28), feat_dim=8)
    k = 6
    labels = jnp.asarray([1, 1, 1, 1, 1, 1], jnp.int32)
    feats = relu_l2_norm(
        jnp.asarray(rng.rand(k, 7, 7, 8).astype(np.float32)), axis=-1)
    masks = jnp.ones((k, 28, 28)) * 0.9
    boxes = jnp.asarray(np.tile([0, 0, 20, 20], (k, 1)).astype(np.float32))
    valid = jnp.ones((k,), bool)
    bank = jax.jit(bank_append)(bank, labels, feats, masks, boxes, valid)
    assert int(bank.count[1]) == 6
    assert int(bank.ptr[1]) == 2     # wrapped around (6 mod 4)
    assert int(bank.count[0]) == 0

    kf, km, kv = jax.jit(lambda b: bank_retrieve(
        b, jnp.asarray(1), feats[0], masks[0], boxes[0]))(bank)
    assert kf.shape == (4, 7, 7, 8)  # min(max_retrieval, len_queue)
    assert bool(kv.any())
    # wrong class retrieves nothing
    _, _, kv0 = bank_retrieve(bank, jnp.asarray(0), feats[0], masks[0],
                              boxes[0])
    assert not bool(kv0.any())

    # the flat BATCHED retrieval (production path) must agree with a
    # vmap of the per-query version exactly
    from boxinstseg_tpu.ops.correspondence import bank_retrieve_batch
    q_labels = jnp.asarray([1, 0, 1], jnp.int32)
    q_feats = feats[:3]
    q_masks = masks[:3]
    q_boxes = boxes[:3]
    bf, bm, bv = jax.jit(lambda b: bank_retrieve_batch(
        b, q_labels, q_feats, q_masks, q_boxes))(bank)
    vf, vm, vv = jax.vmap(
        lambda l, f, m, x: bank_retrieve(bank, l, f, m, x))(
        q_labels, q_feats, q_masks, q_boxes)
    np.testing.assert_array_equal(np.asarray(bv), np.asarray(vv))
    np.testing.assert_allclose(np.asarray(bf), np.asarray(vf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bm), np.asarray(vm), rtol=1e-6)
