"""On-device minimum spanning tree over the 4-connected pixel grid.

The reference computes the MST on the CPU with a Boruvka union-find, one
std::thread per image (reference: mmdet/ops/tree_filter/src/mst/
boruvka.cpp:20-112, mst.cu:86-117), then BFS-orders it on the GPU
(bfs.cu:19-98). The round-1 TPU port used a scipy host callback — but the
axon TPU runtime does not support host callbacks, so the tree filter (and
with it BoxLevelset / Box2Mask training) could not run on real hardware.

This module is a fully on-device replacement:

- ``boruvka_mst``: parallel Boruvka. Per round, every component picks its
  lexicographically (weight, edge-index) minimal outgoing edge via
  scatter-min, components merge through min-label hook + pointer-jumping
  (converged per round, so the classic acyclicity argument applies), and
  ceil(log2 N) rounds suffice. All ``lax`` control flow, fixed shapes.
- ``root_tree``: level-synchronous BFS rooting at node 0 producing
  (parent, depth) — one frontier expansion per scan step, bounded by the
  same ``max_depth`` the downstream tree-filter scans use.

Lexicographic tie-breaking makes the edge order total, so the tree is
unique and deterministic; for distinct weights it equals scipy's MST
(tested against scipy.sparse.csgraph in tests/test_tree_filter.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def grid_edges(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static (src, dst) int32 arrays for the 4-connected HxW grid:
    first the (h, w-1) right edges, then the (h-1, w) down edges."""
    idx = np.arange(h * w, dtype=np.int32).reshape(h, w)
    src = np.concatenate([idx[:, :-1].ravel(), idx[:-1, :].ravel()])
    dst = np.concatenate([idx[:, 1:].ravel(), idx[1:, :].ravel()])
    return src, dst


@functools.lru_cache(maxsize=None)
def grid_neighbors(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-node static tables for gather-only BFS:
    nbr (N, 4) neighbor node ids (left, right, up, down; -1 invalid) and
    eid (N, 4) the undirected edge id connecting to that neighbor
    (right edges first, then down edges, matching grid_edges)."""
    n = h * w
    y, x = np.divmod(np.arange(n, dtype=np.int64), w)
    nbr = np.full((n, 4), -1, np.int32)
    eid = np.full((n, 4), 0, np.int32)
    n_right = h * (w - 1)

    def right_edge(yy, xx):   # edge between (yy, xx) and (yy, xx+1)
        return (yy * (w - 1) + xx).astype(np.int32)

    def down_edge(yy, xx):    # edge between (yy, xx) and (yy+1, xx)
        return (n_right + yy * w + xx).astype(np.int32)

    m = x > 0
    nbr[m, 0] = (y[m] * w + x[m] - 1).astype(np.int32)
    eid[m, 0] = right_edge(y[m], x[m] - 1)
    m = x < w - 1
    nbr[m, 1] = (y[m] * w + x[m] + 1).astype(np.int32)
    eid[m, 1] = right_edge(y[m], x[m])
    m = y > 0
    nbr[m, 2] = ((y[m] - 1) * w + x[m]).astype(np.int32)
    eid[m, 2] = down_edge(y[m] - 1, x[m])
    m = y < h - 1
    nbr[m, 3] = ((y[m] + 1) * w + x[m]).astype(np.int32)
    eid[m, 3] = down_edge(y[m], x[m])
    return nbr, eid


def boruvka_mst(src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray,
                n: int) -> jnp.ndarray:
    """MST edge selection for one connected graph.

    Args:
      src, dst: (E,) int32 endpoints. weights: (E,) float32.
      n: number of nodes (static).
    Returns:
      chosen: (E,) bool — True for the n-1 tree edges.
    """
    e = src.shape[0]
    eidx = jnp.arange(e, dtype=jnp.int32)
    nodes = jnp.arange(n, dtype=jnp.int32)
    rounds = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    inf = jnp.float32(np.inf)

    def round_fn(carry, _):
        lbl, chosen = carry
        cs, cd = lbl[src], lbl[dst]
        live = cs != cd
        wl = jnp.where(live, weights, inf)

        # per-component minimal outgoing weight, then min edge index among
        # weight-minimal edges (lexicographic (w, idx) selection)
        best_w = jnp.full((n,), inf).at[cs].min(wl).at[cd].min(wl)
        cand_s = jnp.where(live & (wl == best_w[cs]), eidx, e)
        cand_d = jnp.where(live & (wl == best_w[cd]), eidx, e)
        best_i = jnp.full((n,), e, jnp.int32).at[cs].min(cand_s) \
                                             .at[cd].min(cand_d)
        has = best_i < e
        e_sel = jnp.minimum(best_i, e - 1)

        mark = jnp.zeros((e,), jnp.int32).at[
            jnp.where(has, best_i, 0)].max(has.astype(jnp.int32))
        chosen = chosen | (mark > 0)

        # hook each component to its partner's label (smaller label wins),
        # then propagate the min label to convergence so next round's
        # selection sees exact components
        a, b = cs[e_sel], cd[e_sel]
        partner = jnp.where(has, a + b - nodes, nodes)
        ptr = jnp.minimum(nodes, partner)

        def prop_cond(s):
            return s[1]

        def prop_body(s):
            p, _ = s
            p2 = jnp.minimum(p, p[p])                # path compression
            p3 = jnp.minimum(p2, p2[partner])        # relax hook edges
            return p3, jnp.any(p3 != p)

        ptr, _ = jax.lax.while_loop(prop_cond, prop_body, (ptr, True))
        return (ptr[lbl], chosen), None

    lbl0 = nodes
    chosen0 = jnp.zeros((e,), bool)

    # while_loop with live-edge early exit: natural-image trees usually
    # connect in far fewer than the worst-case ceil(log2 N) rounds
    def cond(carry):
        lbl, chosen, i = carry
        return (i < rounds) & jnp.any(lbl[src] != lbl[dst])

    def body(carry):
        lbl, chosen, i = carry
        (lbl, chosen), _ = round_fn((lbl, chosen), None)
        return lbl, chosen, i + 1

    _, chosen, _ = jax.lax.while_loop(cond, body,
                                      (lbl0, chosen0, jnp.int32(0)))
    return chosen


def root_tree(nbr: jnp.ndarray, eid: jnp.ndarray, chosen: jnp.ndarray,
              n: int, max_depth: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Root the chosen-edge tree at node 0 by gather-only BFS.

    Per node the 4 grid neighbors and their edge ids are STATIC tables
    (``grid_neighbors``), so each level is a handful of (N, 4) gathers —
    no scatters (TPU scatter lowering dominated the old edge-list
    formulation). Returns (parent, depth), (n,) int32 each; parent[0] = 0;
    nodes deeper than ``max_depth`` (beyond the downstream scan budget
    anyway) stay isolated roots.
    """
    # per-(node, slot): is this slot a tree edge to a valid neighbor
    nbr_safe = jnp.maximum(nbr, 0)
    tree_slot = chosen[eid] & (nbr >= 0)                      # (N, 4)

    parent0 = jnp.arange(n, dtype=jnp.int32)
    known0 = jnp.zeros((n,), bool).at[0].set(True)
    depth0 = jnp.zeros((n,), jnp.int32)

    unroll = 8

    def level(parent, known, depth, d):
        nb_known = known[nbr_safe] & tree_slot                # (N, 4)
        reach = nb_known.any(axis=1) & ~known
        # a frontier node has exactly one tree edge into the known set
        slot = jnp.argmax(nb_known, axis=1)
        par = jnp.take_along_axis(nbr_safe, slot[:, None], axis=1)[:, 0]
        parent = jnp.where(reach, par, parent)
        depth = jnp.where(reach, d, depth)
        return parent, known | reach, depth

    def step(carry, d0):
        parent, known, depth = carry
        for k in range(unroll):      # 8 levels per scan iteration
            parent, known, depth = level(parent, known, depth, d0 + k)
        return (parent, known, depth), None

    n_steps = (max_depth + unroll - 1) // unroll
    (parent, known, depth), _ = jax.lax.scan(
        step, (parent0, known0, depth0),
        jnp.arange(1, n_steps * unroll + 1, unroll, dtype=jnp.int32))
    parent = jnp.where(known, parent, jnp.arange(n, dtype=jnp.int32))
    parent = parent.at[0].set(0)
    return parent, depth


def grid_mst_device(w_right: jnp.ndarray, w_down: jnp.ndarray,
                    max_depth: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched grid MST + rooting, fully on device.

    Args:
      w_right: (B, H, W-1) edge weights; w_down: (B, H-1, W).
      max_depth: BFS/scan depth budget (static).
    Returns:
      (parent, depth): (B, H*W) int32 each.
    """
    b, h, wm1 = w_right.shape
    w = wm1 + 1
    n = h * w
    src_np, dst_np = grid_edges(h, w)
    nbr_np, eid_np = grid_neighbors(h, w)
    src = jnp.asarray(src_np)
    dst = jnp.asarray(dst_np)
    nbr = jnp.asarray(nbr_np)
    eid = jnp.asarray(eid_np)
    weights = jnp.concatenate(
        [w_right.reshape(b, -1), w_down.reshape(b, -1)], axis=1)

    def per_image(wgt):
        chosen = boruvka_mst(src, dst, wgt, n)
        return root_tree(nbr, eid, chosen, n, max_depth)

    return jax.vmap(per_image)(weights.astype(jnp.float32))
