"""Backend-agnostic invariants for the tree solvers/filter.

Round-5 regression guards for a REAL-HARDWARE bug the CPU-only oracle
tests could not see: TPU f32 gathers flush denormal BIT PATTERNS to
zero, so int32 pointers bitcast into an f32 packed-table column (all
pointer values < 2^23 are denormal as f32 bits) came back as 0 from
every pointer-doubling row-gather. On device this silently collapsed
every MST rooting to depth <= 2 and killed the tree-filter up/down
propagation after ~2 rounds — while all CPU tests stayed green. The
packed tables are now INT32 (float columns carried as raw bits:
ops/tree_filter.py round_fn, ops/mst.py depth_body).

These tests assert properties any correct implementation must satisfy
on the backend actually running them — run them on TPU and the old
packing fails each one.

Reference parity surface: mmdet/ops/tree_filter/src/mst.cu +
refine.cu (the reference computes MST/BFS on CPU+CUDA and never hits
TPU gather semantics).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_int32_packed_gather_preserves_float_bits():
    """The packing contract itself: an int32 table row-gather must move
    raw bits untouched, including values whose f32 interpretation is
    denormal (1..2^23-1). An f32 table gather does NOT guarantee this
    on TPU — which is exactly why the packed tables are int32."""
    vals = jnp.arange(1, 257, dtype=jnp.int32)   # denormal as f32 bits
    tab = jnp.stack([vals, vals * 7 + 3], axis=1)
    idx = jnp.asarray(np.random.RandomState(0).permutation(256))
    out = jax.jit(lambda t, i: t[i])(tab, idx)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(tab)[np.asarray(idx)])


def test_grid_mst_depth_reaches_far_corner():
    """Any spanning tree of an HxW grid rooted at corner node 0 has
    depth >= (H-1)+(W-1) (the tree path to the far corner uses grid
    edges only). The denormal-flush bug made depth.max() == 2."""
    from boxinstseg_tpu.ops.mst import grid_mst_device

    h = w = 24
    rng = np.random.RandomState(1)
    wr = jnp.asarray(rng.rand(2, h, w - 1).astype(np.float32))
    wd = jnp.asarray(rng.rand(2, h - 1, w).astype(np.float32))
    parent, depth = jax.jit(
        lambda a, b: grid_mst_device(a, b, max_depth=4 * h * w))(wr, wd)
    parent = np.asarray(parent)
    depth = np.asarray(depth)
    for b in range(2):
        assert depth[b].max() >= (h - 1) + (w - 1), depth[b].max()
        assert (depth[b] == 0).sum() == 1          # single root
        nz = np.nonzero(depth[b] > 0)[0]
        # parent pointers must descend exactly one level
        np.testing.assert_array_equal(depth[b][parent[b][nz]],
                                      depth[b][nz] - 1)


def test_tree_filter_uniform_guide_is_global_mean():
    """With a constant guide every edge weight is exp(0)=1, so the
    normalized tree aggregation equals the GLOBAL mean at every node —
    far nodes contribute with weight 1. Under the pointer-collapse bug
    only a ~2-hop neighborhood mixed, so outputs varied per node."""
    from boxinstseg_tpu.ops.tree_filter import grid_mst, tree_filter2d

    h = w = 16
    guide = jnp.zeros((1, h, w, 3))
    feat = jnp.asarray(
        np.random.RandomState(2).rand(1, h, w, 5).astype(np.float32))
    # tie-broken MST of a uniform grid is still a spanning tree
    parent, depth = jax.jit(lambda g: grid_mst(g, max_depth=h * w))(guide)
    out = jax.jit(lambda f, g: tree_filter2d(
        f, g, parent, depth, low_tree=False, max_depth=h * w))(feat, guide)
    want = np.asarray(feat).reshape(-1, 5).mean(axis=0)
    np.testing.assert_allclose(np.asarray(out).reshape(-1, 5),
                               np.broadcast_to(want, (h * w, 5)),
                               rtol=2e-4, atol=2e-4)


def test_tree_filter_grad_flows_from_far_nodes():
    """d(out at root)/d(f at the far corner) must be nonzero when all
    weights are ~1 (every node's value reaches every other node). The
    collapsed-pointer aggregation zeroed long-range gradients."""
    from boxinstseg_tpu.ops.tree_filter import grid_mst, tree_filter2d

    h = w = 12
    guide = jnp.zeros((1, h, w, 2))
    parent, depth = jax.jit(lambda g: grid_mst(g, max_depth=h * w))(guide)

    def root_out(f):
        out = tree_filter2d(f, guide, parent, depth, low_tree=False,
                            max_depth=h * w)
        return out[0, 0, 0, 0]

    g = jax.jit(jax.grad(root_out))(jnp.ones((1, h, w, 1)))
    far = float(np.asarray(g)[0, h - 1, w - 1, 0])
    assert far > 1e-6, far
