"""Equivalence tests for TPU hot-path rewrites:

- sample_positives_per_gt (sort+cumsum formulation) vs the direct
  grouped-top_k formulation it replaced (reference semantics:
  condinst_head.py:1186-1232 topk_per_img branch);
- the space-to-depth stem conv vs the plain 7x7/s2 convolution;
- avg_pool_stride's two-stage reduction vs a naive mean.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boxinstseg_tpu.core.targets.fcos import sample_positives_per_gt


def _topk_oracle(scores, gt_inds, gt_valid, capacity):
    """The original grouped-top_k formulation (kept as test oracle)."""
    B, P = scores.shape
    G = gt_valid.shape[1]
    K = capacity
    per_gt_k = min(K, P)
    grp = gt_inds[:, None, :] == jnp.arange(G)[None, :, None]
    grp_scores = jnp.where(grp, scores[:, None, :], -jnp.inf)
    top_vals, top_idx = jax.lax.top_k(grp_scores, per_gt_k)
    num_gts = jnp.maximum(gt_valid.sum(axis=1), 1)
    inst_per_gt = jnp.maximum(K // num_gts, 1)
    rank = jnp.arange(per_gt_k)[None, None, :]
    keep = (rank < inst_per_gt[:, None, None]) & jnp.isfinite(top_vals)
    keep = keep & gt_valid[:, :, None]
    priority = jnp.where(keep, top_vals, -jnp.inf)
    priority = priority + jnp.where((rank == 0) & keep, 1e9, 0.0)
    flat_pri = priority.reshape(B, G * per_gt_k)
    sel_vals, sel_flat = jax.lax.top_k(flat_pri, K)
    sel_g = sel_flat // per_gt_k
    point_idx = jnp.take_along_axis(
        top_idx.reshape(B, G * per_gt_k), sel_flat, axis=1)
    valid = jnp.isfinite(sel_vals)
    point_idx = jnp.where(valid, point_idx, 0).astype(jnp.int32)
    sample_gt = jnp.where(valid, sel_g, 0).astype(jnp.int32)
    return point_idx, sample_gt, valid


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_sample_positives_matches_topk_oracle(seed):
    rng = np.random.RandomState(seed)
    B, P, G = int(rng.randint(1, 4)), int(rng.randint(20, 120)), 8
    K = int(rng.choice([G + 4, 32, P + 7]))  # capacity >= max_gts
    scores = jnp.asarray(rng.rand(B, P).astype(np.float32))
    n_real = rng.randint(0, G + 1, size=B)
    gt_valid = jnp.asarray(np.arange(G)[None] < n_real[:, None])
    gt_inds = jnp.asarray(rng.randint(-1, G, size=(B, P)).astype(np.int32))

    a = _topk_oracle(scores, gt_inds, gt_valid, K)
    b = sample_positives_per_gt(scores, gt_inds, gt_valid, K)
    # the SELECTED SET is what the loss consumes (slot order within the
    # capacity only permutes masked sums)
    for i in range(B):
        sa = {(int(p), int(g)) for p, g, v in
              zip(np.asarray(a[0][i]), np.asarray(a[1][i]),
                  np.asarray(a[2][i])) if v}
        sb = {(int(p), int(g)) for p, g, v in
              zip(np.asarray(b[0][i]), np.asarray(b[1][i]),
                  np.asarray(b[2][i])) if v}
        assert sa == sb, (i, sorted(sa ^ sb))


def test_sample_positives_no_gts():
    scores = jnp.asarray(np.random.RandomState(0).rand(2, 30).astype(
        np.float32))
    gt_valid = jnp.zeros((2, 4), bool)
    gt_inds = jnp.full((2, 30), -1, jnp.int32)
    pid, sg, valid = sample_positives_per_gt(scores, gt_inds, gt_valid, 8)
    assert not bool(valid.any())


def test_stem_s2d_matches_plain_conv():
    from boxinstseg_tpu.models.backbones.resnet import _StemConv7
    m = _StemConv7(64)
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 32, 48, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    w7 = v['params']['kernel']
    assert w7.shape == (7, 7, 3, 64)   # checkpoint-converter layout
    ref = jax.lax.conv_general_dilated(
        x, w7, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(m.apply(v, x)), np.asarray(ref),
                               atol=2e-5)
    # odd-size fallback path
    xo = x[:, :31, :47]
    refo = jax.lax.conv_general_dilated(
        xo, w7, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(m.apply(v, xo)),
                               np.asarray(refo), atol=2e-5)


def test_avg_pool_stride_two_stage():
    from boxinstseg_tpu.ops import avg_pool_stride
    x = jnp.asarray(
        np.random.RandomState(1).rand(2, 12, 16, 3).astype(np.float32))
    got = avg_pool_stride(x, 4)
    want = np.asarray(x).reshape(2, 3, 4, 4, 4, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
