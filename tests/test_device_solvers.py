"""On-device discrete solvers vs scipy oracles.

These replace the train graph's two host callbacks (scipy
linear_sum_assignment, scipy csgraph MST) — the axon TPU runtime rejects
host callbacks entirely, so callback-free training is a hardware
requirement, not just a perf win.
"""
import numpy as np

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401


def test_lsa_matches_scipy(rng):
    from scipy.optimize import linear_sum_assignment
    from boxinstseg_tpu.ops.lsa import solve_lsa
    solve = jax.jit(solve_lsa)
    for _ in range(30):
        n = rng.randint(1, 12)
        m = rng.randint(n, 16)
        c = rng.randn(n, m).astype(np.float32) * rng.choice([0.1, 1, 100])
        col4row = np.asarray(solve(jnp.asarray(c)))
        r, cc = linear_sum_assignment(c)
        assert len(set(col4row.tolist())) == n          # a permutation
        np.testing.assert_allclose(c[np.arange(n), col4row].sum(),
                                   c[r, cc].sum(), rtol=1e-4, atol=1e-4)


def test_lsa_vmap_batch(rng):
    from scipy.optimize import linear_sum_assignment
    from boxinstseg_tpu.ops.lsa import solve_lsa
    cb = rng.randn(6, 8, 14).astype(np.float32)
    outs = np.asarray(jax.jit(jax.vmap(solve_lsa))(jnp.asarray(cb)))
    for i in range(6):
        r, cc = linear_sum_assignment(cb[i])
        np.testing.assert_allclose(
            cb[i][np.arange(8), outs[i]].sum(), cb[i][r, cc].sum(),
            rtol=1e-4, atol=1e-4)


def test_hungarian_match_respects_padding(rng):
    from scipy.optimize import linear_sum_assignment
    from boxinstseg_tpu.core.targets.hungarian import hungarian_match
    b, q, g = 3, 10, 5
    cost = rng.randn(b, q, g).astype(np.float32)
    gt_valid = np.zeros((b, g), bool)
    gt_valid[0, :3] = True
    gt_valid[1, :5] = True
    gt_valid[2, :1] = True
    assigned, valid = jax.jit(hungarian_match)(jnp.asarray(cost),
                                               jnp.asarray(gt_valid))
    assigned, valid = np.asarray(assigned), np.asarray(valid)
    np.testing.assert_array_equal(valid, gt_valid)
    for i in range(b):
        n = gt_valid[i].sum()
        rows, cols = linear_sum_assignment(cost[i, :, :n])
        want = cost[i][rows, cols].sum()
        got = cost[i][assigned[i, :n], np.arange(n)].sum()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        # assigned queries distinct among valid slots
        assert len(set(assigned[i, :n].tolist())) == n


def test_boruvka_matches_scipy(rng):
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import minimum_spanning_tree
    from boxinstseg_tpu.ops.mst import boruvka_mst, grid_edges
    for h, w in [(4, 4), (9, 6), (16, 16), (2, 25)]:
        n = h * w
        src, dst = grid_edges(h, w)
        solve = jax.jit(lambda W, h=h, w=w: boruvka_mst(W, h, w))
        # several draws per shape: a round-budget stall (merge slower than
        # components-halve-per-round) only shows on some weight orders
        for _ in range(5):
            wgt = (rng.rand(len(src)) * 10).astype(np.float32)
            chosen = np.asarray(solve(jnp.asarray(wgt)))
            assert chosen.sum() == n - 1
            ref = minimum_spanning_tree(coo_matrix(
                (wgt + 1.0, (src, dst)), shape=(n, n))).sum() - (n - 1)
            np.testing.assert_allclose(wgt[chosen].sum(), ref, rtol=1e-4)


def test_euler_rooting_matches_bfs_oracle(rng):
    """root_tree_euler (fast path) must produce the exact parent/depth
    arrays of the gather-only BFS oracle, incl. max_depth truncation."""
    from boxinstseg_tpu.ops.mst import (boruvka_mst, grid_edges,
                                        grid_neighbors, root_tree,
                                        root_tree_euler)
    for h, w, max_depth in [(7, 9, 200), (12, 10, 1000), (16, 16, 18)]:
        n = h * w
        src, dst = grid_edges(h, w)
        nbr, eid = grid_neighbors(h, w)
        wgt = jnp.asarray((rng.rand(len(src)) * 10).astype(np.float32))
        nbr_j, eid_j = jnp.asarray(nbr), jnp.asarray(eid)
        chosen = jax.jit(
            lambda W, h=h, w=w: boruvka_mst(W, h, w))(wgt)
        p_ref, d_ref = jax.jit(lambda c: root_tree(
            nbr_j, eid_j, c, n, max_depth))(chosen)
        p_got, d_got = jax.jit(lambda c, h=h, w=w: root_tree_euler(
            c, h, w, max_depth))(chosen)
        np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))
        np.testing.assert_array_equal(np.asarray(p_got), np.asarray(p_ref))


def test_batched_mst_matches_per_graph(rng):
    """The flat block-diagonal batched solver must reproduce per-graph
    results exactly (trees must never leak across batch elements)."""
    from boxinstseg_tpu.ops.mst import (boruvka_mst_batched, grid_edges,
                                        root_tree_euler_batched)
    h, w, B = 9, 7, 3
    n = h * w
    src, dst = grid_edges(h, w)
    wgt = jnp.asarray((rng.rand(B, len(src)) * 10).astype(np.float32))
    solve = jax.jit(lambda W: boruvka_mst_batched(W, h, w))
    root = jax.jit(lambda c: root_tree_euler_batched(c, h, w, 200))
    ch_b = solve(wgt)
    p_b, d_b = root(ch_b)
    for i in range(B):
        ch_1 = solve(wgt[i][None])[0]
        np.testing.assert_array_equal(np.asarray(ch_b[i]),
                                      np.asarray(ch_1))
        p_1, d_1 = root(ch_1[None])
        np.testing.assert_array_equal(np.asarray(p_b[i]),
                                      np.asarray(p_1[0]))
        np.testing.assert_array_equal(np.asarray(d_b[i]),
                                      np.asarray(d_1[0]))


def test_grid_mst_device_rooting(rng):
    from boxinstseg_tpu.ops.mst import grid_mst_device
    h, w = 12, 10
    n = h * w
    wr = rng.rand(2, h, w - 1).astype(np.float32)
    wd = rng.rand(2, h - 1, w).astype(np.float32)
    parent, depth = jax.jit(
        lambda a, b: grid_mst_device(a, b, max_depth=n))(wr, wd)
    parent, depth = np.asarray(parent), np.asarray(depth)
    for i in range(2):
        assert parent[i, 0] == 0 and depth[i, 0] == 0
        nz = np.arange(1, n)
        # every non-root node's parent is one level shallower
        assert (depth[i][parent[i][nz]] == depth[i][nz] - 1).all()
        # walking parents always reaches the root (acyclic, connected)
        for node in rng.choice(n, 10):
            seen = 0
            while node != 0:
                node = parent[i][node]
                seen += 1
                assert seen <= n


def test_device_and_host_mst_agree(rng):
    """The on-device tree must equal the scipy host oracle (same parent
    sets; depths identical since both root at 0)."""
    from boxinstseg_tpu.ops.tree_filter import grid_mst
    guide = rng.rand(2, 8, 9, 3).astype(np.float32)
    p_dev, d_dev = jax.jit(lambda g: grid_mst(g, max_depth=72))(guide)
    p_host, d_host = grid_mst(jnp.asarray(guide), host=True)
    # identical MSTs (weights are distinct with prob 1) => identical
    # rooted structure
    np.testing.assert_array_equal(np.asarray(p_dev), np.asarray(p_host))
    np.testing.assert_array_equal(np.asarray(d_dev), np.asarray(d_host))


def test_hungarian_match_crowded_full_capacity(rng):
    """Crowded-image regime (reference matches EVERY gt against all 100
    queries, mask_hungarian_assigner.py:113-123): 100 queries x 100
    padded GT slots with 60+ valid GTs must reproduce scipy's optimal
    cost, and distinct GTs must get distinct queries."""
    from scipy.optimize import linear_sum_assignment
    from boxinstseg_tpu.core.targets.hungarian import hungarian_match
    b, q, g = 2, 100, 100
    cost = (rng.randn(b, q, g) * 3).astype(np.float32)
    gt_valid = np.zeros((b, g), bool)
    gt_valid[0, :93] = True     # COCO's most crowded images (~93)
    gt_valid[1, :61] = True
    assigned, valid = jax.jit(hungarian_match)(jnp.asarray(cost),
                                               jnp.asarray(gt_valid))
    assigned = np.asarray(assigned)
    for i in range(b):
        n = int(gt_valid[i].sum())
        assert len(set(assigned[i, :n].tolist())) == n, 'duplicate query'
        rows, cols = linear_sum_assignment(cost[i, :, :n])
        want = cost[i][rows, cols].sum()
        got = cost[i][assigned[i, :n], np.arange(n)].sum()
        np.testing.assert_allclose(got, want, rtol=1e-5)
