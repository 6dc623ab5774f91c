"""Tree filter vs O(N^2) brute-force oracle on tiny grids."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boxinstseg_tpu.ops.tree_filter import (grid_mst, tree_filter2d,
                                            tree_filter_reference_numpy)


def test_grid_mst_structure(rng):
    guide = rng.rand(2, 5, 6, 3).astype(np.float32)
    parent, depth = jax.jit(grid_mst)(jnp.asarray(guide))
    parent = np.asarray(parent)
    depth = np.asarray(depth)
    n = 30
    assert parent.shape == (2, n)
    for b in range(2):
        assert parent[b, 0] == 0 and depth[b, 0] == 0
        # every node reaches the root
        for i in range(n):
            node, hops = i, 0
            while node != 0:
                node = parent[b, node]
                hops += 1
                assert hops <= n
        # depth consistency
        for i in range(1, n):
            assert depth[b, i] == depth[b, parent[b, i]] + 1
        # MST edges connect 4-neighbors only
        for i in range(1, n):
            pi = parent[b, i]
            yi, xi = divmod(i, 6)
            yp, xp = divmod(int(pi), 6)
            assert abs(yi - yp) + abs(xi - xp) == 1


@pytest.mark.parametrize('low_tree', [True, False])
def test_tree_filter_matches_bruteforce(rng, low_tree):
    h, w, c, d = 5, 6, 2, 3
    guide = rng.rand(1, h, w, d).astype(np.float32)
    feat = rng.rand(1, h, w, c).astype(np.float32)
    parent, depth = grid_mst(jnp.asarray(guide))
    out = tree_filter2d(jnp.asarray(feat), jnp.asarray(guide),
                        parent, depth, sigma=0.02, low_tree=low_tree,
                        max_depth=h * w)
    # oracle
    g = guide.reshape(-1, d)
    p = np.asarray(parent)[0]
    dep = np.asarray(depth)[0]
    dist = ((g - g[p]) ** 2).sum(-1)
    wgt = np.exp(-dist / 0.02) if low_tree else np.exp(-dist)
    wgt = np.where(dep == 0, 0.0, wgt)
    want = tree_filter_reference_numpy(feat.reshape(-1, c), wgt, p, dep)
    np.testing.assert_allclose(np.asarray(out).reshape(-1, c), want,
                               atol=1e-4, rtol=1e-4)


def test_tree_filter_differentiable(rng):
    h, w = 4, 4
    guide = rng.rand(1, h, w, 2).astype(np.float32)
    feat = rng.rand(1, h, w, 1).astype(np.float32)
    parent, depth = grid_mst(jnp.asarray(guide))

    def loss(f, g):
        out = tree_filter2d(f, g, parent, depth, max_depth=h * w)
        return jnp.sum(out ** 2)

    gf, gg = jax.grad(loss, argnums=(0, 1))(jnp.asarray(feat),
                                            jnp.asarray(guide))
    assert np.all(np.isfinite(np.asarray(gf)))
    assert np.all(np.isfinite(np.asarray(gg)))
    assert np.any(np.asarray(gf) != 0)
    assert np.any(np.asarray(gg) != 0)  # edge weights get gradient too


def test_tree_filter_smooths_within_segments(rng):
    """Filtering over a two-segment image keeps segment means separate."""
    h, w = 8, 8
    guide = np.zeros((1, h, w, 1), np.float32)
    guide[:, :, 4:] = 1.0      # sharp vertical boundary
    feat = rng.rand(1, h, w, 1).astype(np.float32)
    feat[:, :, 4:] += 5.0
    parent, depth = grid_mst(jnp.asarray(guide))
    out = np.asarray(tree_filter2d(jnp.asarray(feat), jnp.asarray(guide),
                                   parent, depth, sigma=0.02,
                                   max_depth=h * w))
    left = out[0, :, :4, 0]
    right = out[0, :, 4:, 0]
    # within-segment variance collapses, across-segment gap preserved
    assert left.std() < 0.05
    assert right.std() < 0.05
    assert right.mean() - left.mean() > 4.0


def test_custom_vjp_matches_naive_autodiff(rng):
    """The O(N)-memory custom backward must equal autodiff of the naive
    scan implementation, for both feature and edge-weight grads."""
    from boxinstseg_tpu.ops.tree_filter import (_tree_aggregate,
                                                _tree_aggregate_naive)
    h, w_, c = 4, 5, 2
    n = h * w_
    guide = rng.rand(1, h, w_, 2).astype(np.float32)
    feat = rng.rand(1, n, c).astype(np.float32)
    parent, depth = grid_mst(jnp.asarray(guide))
    g = guide.reshape(1, n, -1)
    gp = np.take_along_axis(np.asarray(g), np.asarray(parent)[..., None],
                            axis=1)
    wgt = np.exp(-((g - gp) ** 2).sum(-1) / 0.5).astype(np.float32)

    cot = rng.rand(1, n, c).astype(np.float32)

    def run(agg):
        def loss(f, w):
            return jnp.sum(agg(f, w, parent, depth, n) * cot)
        return jax.grad(loss, argnums=(0, 1))(jnp.asarray(feat),
                                              jnp.asarray(wgt))

    df_c, dw_c = run(_tree_aggregate)
    df_n, dw_n = run(_tree_aggregate_naive)
    np.testing.assert_allclose(np.asarray(df_c), np.asarray(df_n),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dw_c), np.asarray(dw_n),
                               atol=1e-4, rtol=1e-3)
