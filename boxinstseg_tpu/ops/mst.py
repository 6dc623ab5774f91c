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
                n: int,
                node_eid: jnp.ndarray = None,
                node_slot_valid: jnp.ndarray = None) -> jnp.ndarray:
    """MST edge selection for one connected graph.

    TPU cost note: the naive formulation does four float scatter-mins
    over the edge list per round — measured ~4 ms each on v5e, ~230 ms
    per step batch. Here the (weight, index) lexicographic order is
    precomputed ONCE as an int32 rank (sort), each node pre-reduces its
    incident edges with static-table gathers, and each round does a
    single int32 scatter-min over nodes.

    Args:
      src, dst: (E,) int32 endpoints. weights: (E,) float32.
      n: number of nodes (static).
      node_eid: optional (N, S) static incident-edge table per node;
        node_slot_valid: (N, S) bool. When absent they are derived by
        scatter (generic graphs).
    Returns:
      chosen: (E,) bool — True for the n-1 tree edges.
    """
    e = src.shape[0]
    eidx = jnp.arange(e, dtype=jnp.int32)
    nodes = jnp.arange(n, dtype=jnp.int32)
    rounds = max(int(np.ceil(np.log2(max(n, 2)))), 1)

    # total (weight, index) order as int32 ranks: order[r] = edge with
    # rank r; rank[e] = r. Stable argsort keeps index tie-breaking.
    order = jnp.argsort(weights, stable=True).astype(jnp.int32)
    rank = jnp.argsort(order).astype(jnp.int32)

    if node_eid is None:
        raise ValueError('boruvka_mst needs the static per-node incident '
                         'tables (node_eid, node_slot_valid) — for grids '
                         'use grid_neighbors(h, w)')
    s_eid = node_eid
    s_valid = node_slot_valid

    def round_fn(carry):
        lbl, chosen = carry
        cs, cd = lbl[src], lbl[dst]
        live = cs != cd
        r = jnp.where(live, rank, e)                     # (E,) int32

        # node-centric pre-min over the static incident slots (gathers)
        rn = jnp.where(s_valid, r[s_eid], e).min(axis=1)  # (N,)
        # per-component min: ONE scatter-min keyed by label. The scatter
        # runs in f32 — ranks < E < 2^24 are exact, and XLA's TPU i32
        # scatter-min lowers to a serial loop (~170 ms at 96x96 vs ~4 ms
        # for the f32 one; measured on v5e)
        rmin = jnp.full((n,), e, jnp.float32).at[lbl].min(
            rn.astype(jnp.float32)).astype(jnp.int32)
        has = rmin < e
        e_sel = order[jnp.minimum(rmin, e - 1)]           # (N,) edge ids

        chosen = chosen.at[jnp.where(has, e_sel, 0)].max(has)

        # hook each component TO its partner (so every chosen edge merges
        # its two components this round — guaranteeing components at least
        # halve per round). The total (weight, idx) order makes mutual
        # 2-cycles the only possible cycles; break them to the smaller
        # label, which becomes the hook-tree root.
        a, b = cs[e_sel], cd[e_sel]
        partner = jnp.where(has, a + b - nodes, nodes)
        mutual = partner[partner] == nodes
        ptr = jnp.where(mutual & (nodes < partner), nodes, partner)

        def prop_cond(s):
            return s[1]

        def prop_body(s):
            p, _ = s
            p2 = p[p]                                # pointer jumping
            return p2, jnp.any(p2 != p)

        ptr, _ = jax.lax.while_loop(prop_cond, prop_body, (ptr, True))
        return ptr[lbl], chosen

    lbl0 = nodes
    chosen0 = jnp.zeros((e,), bool)

    # while_loop with live-edge early exit: natural-image trees usually
    # connect in far fewer than the worst-case ceil(log2 N) rounds
    def cond(carry):
        lbl, chosen, i = carry
        return (i < rounds) & jnp.any(lbl[src] != lbl[dst])

    def body(carry):
        lbl, chosen, i = carry
        lbl, chosen = round_fn((lbl, chosen))
        return lbl, chosen, i + 1

    _, chosen, _ = jax.lax.while_loop(cond, body,
                                      (lbl0, chosen0, jnp.int32(0)))
    return chosen


def root_tree_euler(nbr: jnp.ndarray, eid: jnp.ndarray,
                    chosen: jnp.ndarray, n: int, max_depth: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Root the chosen-edge tree at node 0 via an Euler tour +
    pointer-doubling list ranking — O(log N) rounds of pure gathers.

    The BFS formulation walked ``max_depth`` (512) sequential frontier
    levels (~440 ms per BoxLevelset step on v5e); the Euler tour of the
    2(N-1) arcs is ranked in ceil(log2 4N) (~16) doubling rounds instead:

    1. arcs are (node, slot) pairs over the STATIC 4-slot neighbor table;
       twin(a) flips the slot (left<->right, up<->down);
    2. succ(a=(u->v)) = the next existing arc out of v cyclically after
       twin slot — the classic Euler-tour successor;
    3. cutting the cycle at the first arc out of the root and suffix-
       summing (+1 down / -1 up after a first ranking pass) gives, per
       node, its unique discovery arc -> (parent, depth) exactly.

    Nodes deeper than ``max_depth`` (beyond the downstream scan budget)
    are detached into isolated roots, matching the BFS semantics.
    """
    n4 = 4 * n
    ids = jnp.arange(n4, dtype=jnp.int32)
    twin_slot = jnp.asarray([1, 0, 3, 2], jnp.int32)

    exist = chosen[eid] & (nbr >= 0)                        # (N, 4)
    nbr_safe = jnp.maximum(nbr, 0)
    u_of = ids // 4                                         # (4N,)
    s_of = ids % 4
    valid = exist.reshape(-1)                               # (4N,)
    v_of = nbr_safe.reshape(-1)                             # arc target

    # twin arc id: (v, twin_slot[s])
    twin = v_of * 4 + twin_slot[s_of]

    # succ(a) = first existing arc out of v after twin slot, cyclically
    cand = (twin_slot[s_of][:, None] + jnp.arange(1, 5,
                                                  dtype=jnp.int32)[None]) % 4
    ok = jnp.take_along_axis(exist[v_of], cand, axis=1)      # (4N, 4)
    pick = jnp.argmax(ok, axis=1)
    succ_slot = jnp.take_along_axis(cand, pick[:, None], axis=1)[:, 0]
    succ = jnp.where(valid, v_of * 4 + succ_slot, ids)

    # cut the tour at a0 = first existing arc out of node 0
    a0 = jnp.argmax(exist[0]).astype(jnp.int32)             # slot of node 0
    nxt = jnp.where((succ == a0) | ~valid, ids, succ)

    rounds = max(int(np.ceil(np.log2(max(n4, 2)))), 1)

    def suffix_sum(vals):
        """S(a) = sum of vals over the list from a to the end, inclusive
        (pointer-doubling with alive flags, like ops/tree_filter)."""
        def body(carry, _):
            s, p, alive = carry
            s = s + jnp.where(alive, s[p], 0)
            alive = alive & alive[p]
            p = p[p]
            return (s, p, alive), None
        (s, _, _), _ = jax.lax.scan(
            body, (vals, nxt, nxt != ids), None, length=rounds)
        return s

    # pass 1: d(a) = #arcs from a to the end (inclusive) -> order compare
    d = suffix_sum(jnp.where(valid, 1, 0).astype(jnp.int32))
    # a is the FIRST traversal of its edge iff it comes earlier than its
    # twin, i.e. has the longer suffix
    down = valid & (d > d[twin])

    # pass 2: depth prefix sums of +1 (down) / -1 (up)
    val = jnp.where(down, 1, jnp.where(valid, -1, 0)).astype(jnp.int32)
    s2 = suffix_sum(val)
    prefix_incl = val - s2          # total sum over the tour is 0

    # each node's unique discovery arc writes (parent, depth): unique
    # targets -> cheap scatter
    tgt = jnp.where(down, v_of, n)          # dump slot n
    parent = jnp.full((n + 1,), 0, jnp.int32).at[tgt].max(
        jnp.where(down, u_of, 0))[:n]
    depth = jnp.zeros((n + 1,), jnp.int32).at[tgt].max(
        jnp.where(down, prefix_incl, 0))[:n]
    parent = parent.at[0].set(0)
    depth = depth.at[0].set(0)

    # beyond-budget nodes become isolated roots (BFS-truncation semantics)
    over = depth > max_depth
    parent = jnp.where(over, jnp.arange(n, dtype=jnp.int32), parent)
    depth = jnp.where(over, 0, depth)
    return parent, depth


def root_tree(nbr: jnp.ndarray, eid: jnp.ndarray, chosen: jnp.ndarray,
              n: int, max_depth: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Root the chosen-edge tree at node 0 by gather-only BFS.

    Kept as the oracle/reference implementation (root_tree_euler is the
    fast path); each level is a handful of (N, 4) gathers. Returns
    (parent, depth), (n,) int32 each; parent[0] = 0; nodes deeper than
    ``max_depth`` (beyond the downstream scan budget anyway) stay
    isolated roots.
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
    # exact-budget truncation (the unrolled loop may overrun max_depth by
    # up to unroll-1 levels; detach those, matching root_tree_euler)
    over = depth > max_depth
    parent = jnp.where(over, jnp.arange(n, dtype=jnp.int32), parent)
    depth = jnp.where(over, 0, depth)
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
        chosen = boruvka_mst(src, dst, wgt, n, node_eid=eid,
                             node_slot_valid=jnp.asarray(nbr_np >= 0))
        return root_tree_euler(nbr, eid, chosen, n, max_depth)

    return jax.vmap(per_image)(weights.astype(jnp.float32))
