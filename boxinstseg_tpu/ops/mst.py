"""On-device minimum spanning tree over the 4-connected pixel grid.

The reference computes the MST on the CPU with a Boruvka union-find, one
std::thread per image (reference: mmdet/ops/tree_filter/src/mst/
boruvka.cpp:20-112, mst.cu:86-117), then BFS-orders it on the GPU
(bfs.cu:19-98). The round-1 TPU port used a scipy host callback — but the
axon TPU runtime does not support host callbacks, so the tree filter (and
with it BoxLevelset / Box2Mask training) could not run on real hardware.

This module is a fully on-device replacement:

- ``boruvka_mst_batched``: parallel Boruvka. Per round, every component
  picks its lexicographically (weight, edge-index) minimal outgoing edge
  via scatter-min, components merge through partner hooking +
  pointer-jumping (converged per round, so the classic acyclicity
  argument applies), and ceil(log2 N) rounds suffice.
- ``root_tree_euler_batched``: Euler-tour + pointer-doubling list-ranking
  rooting at node 0 producing (parent, depth).

TPU design (see docs/tpu_performance_notes.md — gathers/scatters pay per
ROW, ~6 ns each, almost regardless of row width):

- every index table that is STATIC on the grid (edge endpoints, per-node
  incident edges, Euler twin arcs, neighbor existence) is evaluated as
  shifted/padded SLICES of the (B, H, W[, 4]) layout instead of a gather
  — slices are free, 295k-row gathers are ~1.7 ms each at BoxLevelset
  batch sizes;
- the remaining genuinely data-dependent gathers in the pointer-doubling
  rounds carry (value, pointer) PACKED in one two-column table with a
  sentinel row, one width-2 row-gather per round instead of three;
- all trees of a batch run as ONE flat block-diagonal problem (a vmapped
  gather/scatter lowers to a serial per-batch loop on TPU);
- the per-component argmin is an f32 scatter-min of precomputed int32
  lexicographic ranks (i32 scatter-min lowers to a ~170 ms serial loop;
  ranks < 2^24 are exact in f32).

Lexicographic tie-breaking makes the edge order total, so the tree is
unique and deterministic; for distinct weights it equals scipy's MST
(tested against scipy.sparse.csgraph in tests/test_device_solvers.py).
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
    """Per-node static tables (kept for the BFS rooting oracle):
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


# slot order: 0=left, 1=right, 2=up, 3=down; twin flips the direction
_TWIN_SLOT = (1, 0, 3, 2)


def _at_neighbor(p: jnp.ndarray, s: int, fill) -> jnp.ndarray:
    """out[..., y, x] = p[..., y', x'] at the slot-``s`` neighbor (y', x')
    of (y, x); ``fill`` where the neighbor is off-grid. Pure pad+slice —
    the TPU-free replacement for every static neighbor-table gather."""
    if s == 0:      # neighbor (y, x-1)
        return jnp.concatenate(
            [jnp.full_like(p[..., :, :1], fill), p[..., :, :-1]], -1)
    if s == 1:      # neighbor (y, x+1)
        return jnp.concatenate(
            [p[..., :, 1:], jnp.full_like(p[..., :, :1], fill)], -1)
    if s == 2:      # neighbor (y-1, x)
        return jnp.concatenate(
            [jnp.full_like(p[..., :1, :], fill), p[..., :-1, :]], -2)
    return jnp.concatenate(
        [p[..., 1:, :], jnp.full_like(p[..., :1, :], fill)], -2)


def boruvka_mst_batched(weights: jnp.ndarray, h: int, w: int
                        ) -> jnp.ndarray:
    """Parallel Boruvka over a BATCH of HxW grids, run as ONE flat
    block-diagonal graph (nodes of image b live at [b*n, (b+1)*n)).

    Args:
      weights: (B, E) f32 edge weights, E = h*(w-1) + (h-1)*w laid out
        [right edges row-major, then down edges row-major] (grid_edges).
    Returns:
      chosen: (B, E) bool — per graph, True for its n-1 tree edges.

    Per round the only data-dependent index ops are: one f32 scatter-min
    (component argmin), one width-2 row-gather of the selected edge's
    endpoint labels, the pointer-jumping gathers, and the label
    relabeling gather. Endpoint labels and the per-node incident-edge
    min are shifted slices of the (B, H, W) label image — the
    src/dst/incident tables of a grid are static.
    """
    bsz, e = weights.shape
    # the rank scheme stores rank values / sort permutations / rmin ids
    # in f32 in three places — exact only below 2^24 (see comment below)
    assert bsz * e < (1 << 24), (
        f'boruvka_mst_batched: bsz*e = {bsz * e} exceeds the f32-exact '
        f'integer range (2^24) required by the rank tables; split the '
        f'batch')
    n = h * w
    n_right = h * (w - 1)
    ne, eg = bsz * n, bsz * e
    rounds = max(int(np.ceil(np.log2(max(n, 2)))), 1)

    # The lexicographic (weight, edge-index) component argmin used to run
    # as TWO dependent f32 scatter-mins per round — min weight, then min
    # edge id among weight-ties, with a component-broadcast gather in
    # between (~2 dependent 73k-row hops/round at BoxLevelset shapes).
    # Precompute a UNIQUE f32 rank per edge once instead: a STABLE f32
    # argsort orders by (weight, flat edge id) exactly, and the inverse
    # permutation comes from a second f32 argsort of the permutation
    # itself (values < 2^24 are f32-exact; jnp.argsort's int path lowers
    # ~200x slower — the reason the original rank design was dropped).
    # Each round then needs ONE scatter-min; rank -> edge id is the tiny
    # sort permutation gather.
    wflat = weights.reshape(-1)
    order = jnp.argsort(wflat, stable=True)                    # rank -> eid
    rank_of = jnp.argsort(order.astype(jnp.float32))           # eid -> rank
    rank2 = rank_of.reshape(bsz, e).astype(jnp.float32)
    rk_r = rank2[:, :n_right].reshape(bsz, h, w - 1)
    rk_d = rank2[:, n_right:].reshape(bsz, h - 1, w)
    inf = jnp.float32(jnp.inf)

    nodes = jnp.arange(ne, dtype=jnp.int32)

    def round_fn(carry):
        lbl3, chosen = carry
        # endpoint labels of every edge: slices of the label image
        cs_r, cd_r = lbl3[:, :, :-1], lbl3[:, :, 1:]
        cs_d, cd_d = lbl3[:, :-1, :], lbl3[:, 1:, :]
        act_r = cs_r != cd_r
        act_d = cs_d != cd_d
        rr_r = jnp.where(act_r, rk_r, inf)
        rr_d = jnp.where(act_d, rk_d, inf)

        # per-node min RANK over its <=4 incident edges: padded slices
        pad_c = jnp.full((bsz, h, 1), inf, jnp.float32)
        pad_r = jnp.full((bsz, 1, w), inf, jnp.float32)
        rn = jnp.minimum(
            jnp.minimum(jnp.concatenate([rr_r, pad_c], 2),     # right slot
                        jnp.concatenate([pad_c, rr_r], 2)),    # left slot
            jnp.minimum(jnp.concatenate([rr_d, pad_r], 1),     # down slot
                        jnp.concatenate([pad_r, rr_d], 1)))    # up slot

        # per-COMPONENT argmin edge in ONE scatter-min: ranks are unique
        # and order exactly like (weight, edge id)
        lbl_f = lbl3.reshape(-1)
        rmin = jnp.full((ne,), inf, jnp.float32).at[lbl_f].min(
            rn.reshape(-1))
        has = jnp.isfinite(rmin)
        e_sel = order[jnp.where(has, rmin, 0).astype(jnp.int32)]

        chosen = chosen.at[e_sel].max(has)

        # both endpoint labels of the selected edge: ONE width-2 gather
        ends = jnp.concatenate([
            jnp.stack([cs_r.reshape(bsz, -1), cd_r.reshape(bsz, -1)], -1),
            jnp.stack([cs_d.reshape(bsz, -1), cd_d.reshape(bsz, -1)], -1),
        ], axis=1).reshape(eg, 2)
        ab = ends[e_sel]
        a, b = ab[:, 0], ab[:, 1]

        # hook each component TO its partner (so every chosen edge merges
        # its two components this round — components at least halve per
        # round). The total (weight, idx) order makes mutual 2-cycles the
        # only possible cycles; break them to the smaller label.
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
        lbl3 = ptr[lbl3.reshape(-1)].reshape(bsz, h, w)
        # liveness of the NEW labels (slices + reduce, no gathers)
        live = (jnp.any(lbl3[:, :, :-1] != lbl3[:, :, 1:])
                | jnp.any(lbl3[:, :-1, :] != lbl3[:, 1:, :]))
        return lbl3, chosen, live

    # while_loop with live-edge early exit: natural-image trees usually
    # connect in far fewer than the worst-case ceil(log2 N) rounds
    def cond(carry):
        _, _, i, live = carry
        return (i < rounds) & live

    def body(carry):
        lbl3, chosen, i, _ = carry
        lbl3, chosen, live = round_fn((lbl3, chosen))
        return lbl3, chosen, i + 1, live

    lbl0 = nodes.reshape(bsz, h, w)
    _, chosen, _, _ = jax.lax.while_loop(
        cond, body,
        (lbl0, jnp.zeros((eg,), bool), jnp.int32(0), jnp.bool_(True)))
    return chosen.reshape(bsz, e)


def boruvka_mst(weights: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Single-graph MST edge selection (see ``boruvka_mst_batched``)."""
    return boruvka_mst_batched(weights[None], h, w)[0]


def root_tree_euler_batched(chosen: jnp.ndarray, h: int, w: int,
                            max_depth: int
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Root a BATCH of chosen-edge grid trees (each at its node 0) via
    Euler tours + pointer-doubling list ranking — O(log N) rounds over
    ONE flat arc array (no batch dims: a vmapped gather serializes per
    batch element on TPU).

    The BFS formulation walked ``max_depth`` (512) sequential frontier
    levels (~440 ms per BoxLevelset step on v5e); the Euler tour of the
    2(N-1) arcs is ranked in ceil(log2 2N) (~15) doubling rounds instead:

    1. arcs are (node, slot) pairs over the STATIC 4-slot neighbor
       layout; twin(a) flips the slot (left<->right, up<->down);
    2. succ(a=(u->v)) = the next existing arc out of v cyclically after
       the twin slot — the classic Euler-tour successor. Arc existence
       at the neighbor is a shifted slice of the (B, H, W, 4) existence
       planes (``_at_neighbor``), not a gather;
    3. cutting each tour at the first arc out of its root and ranking it
       (suffix count of valid arcs) identifies, per node, its unique
       discovery arc -> parent exactly (the down test d > d[twin] reads
       the twin's rank through the same shifted slices); depth then
       comes from pointer doubling over the parent array itself — ne
       rows per round instead of replaying the 4*ne-row arc chains.

    Each doubling round is ONE width-2 row-gather of a (value, pointer)
    packed table with a sentinel row (see ``ops/tree_filter.py``).

    Nodes deeper than ``max_depth`` (beyond the downstream scan budget)
    are detached into isolated roots, matching the BFS semantics.

    Args:
      chosen: (B, E) bool tree edges (grid_edges layout).
    Returns:
      (parent, depth): (B, N) int32 each, LOCAL per-graph node ids.
    """
    bsz, e = chosen.shape
    n = h * w
    n_right = h * (w - 1)
    ne = bsz * n
    n4 = 4 * ne
    ids = jnp.arange(n4, dtype=jnp.int32)

    ch_r = chosen[:, :n_right].reshape(bsz, h, w - 1)
    ch_d = chosen[:, n_right:].reshape(bsz, h - 1, w)
    f_c = jnp.zeros((bsz, h, 1), bool)
    f_r = jnp.zeros((bsz, 1, w), bool)
    # arc existence per (node, slot): padded slices of the edge planes
    exist4 = jnp.stack([
        jnp.concatenate([f_c, ch_r], 2),       # left
        jnp.concatenate([ch_r, f_c], 2),       # right
        jnp.concatenate([f_r, ch_d], 1),       # up
        jnp.concatenate([ch_d, f_r], 1),       # down
    ], axis=-1)                                # (B, H, W, 4)

    # succ slot: first existing arc out of the neighbor v, cyclically
    # after the twin slot. exist[v, j] = shifted slice of plane j.
    ok = jnp.stack([
        jnp.stack([_at_neighbor(exist4[..., (_TWIN_SLOT[s] + 1 + k) % 4],
                                s, False)
                   for k in range(4)], axis=-1)
        for s in range(4)], axis=-2)           # (B, H, W, 4 slots, 4 k)
    pick = jnp.argmax(ok, axis=-1).astype(jnp.int32)       # (B, H, W, 4)
    twin_tbl = jnp.asarray(_TWIN_SLOT, jnp.int32)
    succ_slot = (twin_tbl[None, None, None] + 1 + pick) % 4

    # global neighbor node id per (node, slot): static arithmetic
    yy = jax.lax.broadcasted_iota(jnp.int32, (bsz, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (bsz, h, w), 2)
    bb = jax.lax.broadcasted_iota(jnp.int32, (bsz, h, w), 0)
    node_g = bb * n + yy * w + xx
    v_of4 = jnp.stack([node_g - 1, node_g + 1, node_g - w, node_g + w],
                      axis=-1)                 # off-grid slots are never
    valid = exist4                             # existing, so ids are moot

    succ = jnp.where(valid, v_of4 * 4 + succ_slot,
                     ids.reshape(bsz, h, w, 4))

    # cut each tour at a0 = first existing arc out of its root (b*n):
    # succ == a0 of its own graph is an elementwise compare
    root_slot = jnp.argmax(exist4[:, 0, 0, :], axis=1).astype(jnp.int32)
    roots = jnp.arange(bsz, dtype=jnp.int32) * n
    a0 = (roots * 4 + root_slot)[:, None, None, None]       # (B,1,1,1)
    nxt = jnp.where((succ == a0) | ~valid,
                    ids.reshape(bsz, h, w, 4), succ).reshape(-1)
    valid_f = valid.reshape(-1)

    # each per-tree list holds at most 2(n-1) valid arcs
    rounds = max(int(np.ceil(np.log2(max(2 * n, 2)))), 1)

    # ---- compact the tour before Wyllie ranking: the doubling rounds
    # pay per ROW (~6 ns/row) and only 2(n-1) of the 4n arc slots per
    # graph are real tour arcs, so ranking the compact list halves every
    # round's gather. Compact positions are the exclusive cumsum of
    # validity (dense); the SUCCESSOR's position is read through the
    # same shifted-slice neighbor planes that built succ itself (no
    # gather); one scatter lays out the compact next-pointer table and
    # one gather maps ranks back to arc slots at the end. Net at
    # BoxLevelset bench shapes (2B=8 trees of 96^2): ~15 rounds x 147k
    # saved rows for ~2 x 295k setup rows.
    lc = 2 * bsz * (n - 1)       # grid MSTs span: exactly n-1 edges/graph
    vi = valid_f.astype(jnp.int32)
    pos = jnp.cumsum(vi) - vi                            # exclusive
    pos4 = pos.reshape(bsz, h, w, 4)
    pos_succ = jnp.stack([
        sum(jnp.where(succ_slot[..., s] == k,
                      _at_neighbor(pos4[..., k], s, 0), 0)
            for k in range(4))
        for s in range(4)], axis=-1).reshape(-1)         # pos[succ(a)]
    is_end = (nxt == ids)        # cut arc (or invalid self-loop)
    pn = jnp.where(is_end, lc, pos_succ)
    tgt_c = jnp.where(valid_f, pos, lc)
    nxtc = jnp.full((lc + 1,), lc, jnp.int32).at[tgt_c].set(
        jnp.where(valid_f, pn, lc))[:lc]

    def suffix_count_compact(vals):
        """S(a) = sum of vals over the compact list from a to the end,
        inclusive. Wyllie pointer doubling with the (value, pointer)
        pair PACKED into one two-column table + a zero sentinel row:
        each round is ONE width-2 row-gather. List ends point at the
        sentinel, whose row (0, SENT) is a fixed point."""

        def body(carry, _):
            s, q = carry
            t = jnp.concatenate(
                [jnp.append(s, 0)[:, None], jnp.append(q, lc)[:, None]],
                axis=1)                                  # (lc+1, 2)
            g = t[q]                                     # ONE row-gather
            return (s + g[:, 0], g[:, 1]), None

        (s, _), _ = jax.lax.scan(body, (vals, nxtc), None, length=rounds)
        return s

    # pass 1: d(a) = #arcs from a to the end (inclusive) -> order
    # compare; rank in compact space, map back to arc slots (invalid
    # slots keep d = 0, matching the old all-arcs formulation)
    d_c = suffix_count_compact(jnp.ones((lc,), jnp.int32))
    d = jnp.append(d_c, 0)[tgt_c]
    # a is the FIRST traversal of its edge iff it comes earlier than its
    # twin, i.e. has the longer suffix. twin(a=(u,s)) = (v, twin_slot[s]):
    # its rank is a shifted slice of the twin-slot rank plane.
    d4 = d.reshape(bsz, h, w, 4)
    d_twin = jnp.stack(
        [_at_neighbor(d4[..., _TWIN_SLOT[s]], s, 0) for s in range(4)],
        axis=-1)
    down = valid & (d4 > d_twin)
    down_f = down.reshape(-1)

    # each node's unique discovery arc (the down arc u->v) writes
    # parent[v] = u. Non-root nodes get exactly one write with parent id
    # >= 0, so a max-scatter from a zero init is exact; roots get no
    # write and are patched densely after.
    u_of = ids // 4
    tgt = jnp.where(down_f, v_of4.reshape(-1), ne)   # shared dump slot
    parent = jnp.full((ne + 1,), 0, jnp.int32).at[tgt].max(
        jnp.where(down_f, u_of, 0))[:ne]
    node_ids = jnp.arange(ne, dtype=jnp.int32)
    is_root = node_ids % n == 0
    parent = jnp.where(is_root, node_ids, parent)

    # depth by pointer doubling over the PARENT array — ne rows per
    # round instead of replaying the 4*ne-row Euler-arc chains (the old
    # pass 2): carry (hops, anc); after round t, anc_i is the ancestor
    # at distance min(depth_i, 2^t) and hops_i that distance; the root
    # row (0, root) is a fixed point. ceil(log2 n) rounds make it exact.
    n_rounds = max(int(np.ceil(np.log2(max(n, 2)))), 1)

    def depth_body(carry, _):
        hops, anc = carry
        # int32 packed table with hops carried as raw bits: TPU f32
        # gathers flush denormal bit patterns to zero, so an int32
        # ancestor column bitcast into an f32 table came back 0 on real
        # hardware (depth collapsed to <= 2); int32 gathers are pure
        # bit movement (see ops/tree_filter.py round_fn)
        t = jnp.concatenate(
            [jax.lax.bitcast_convert_type(hops, jnp.int32)[:, None],
             anc[:, None]], axis=1)                      # (ne, 2)
        g = t[anc]                                       # ONE row-gather
        return (hops + jax.lax.bitcast_convert_type(g[:, 0], jnp.float32),
                g[:, 1]), None

    hops0 = jnp.where(is_root, 0.0, 1.0).astype(jnp.float32)
    (hops, _), _ = jax.lax.scan(depth_body, (hops0, parent), None,
                                length=n_rounds)
    depth = hops.astype(jnp.int32)                       # exact < 2^24

    # beyond-budget nodes become isolated roots (BFS-truncation semantics)
    over = depth > max_depth
    parent = jnp.where(over, node_ids, parent)
    depth = jnp.where(over, 0, depth)
    offs_n = (jnp.arange(bsz, dtype=jnp.int32) * n)[:, None]
    parent = parent.reshape(bsz, n) - offs_n      # back to local ids
    return parent, depth.reshape(bsz, n)


def root_tree_euler(chosen: jnp.ndarray, h: int, w: int, max_depth: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-tree rooting (see ``root_tree_euler_batched``)."""
    parent, depth = root_tree_euler_batched(chosen[None], h, w, max_depth)
    return parent[0], depth[0]


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
      max_depth: scan depth budget (static).
    Returns:
      (parent, depth): (B, H*W) int32 each.
    """
    b, h, wm1 = w_right.shape
    w = wm1 + 1
    weights = jnp.concatenate(
        [w_right.reshape(b, -1), w_down.reshape(b, -1)], axis=1)
    chosen = boruvka_mst_batched(weights.astype(jnp.float32), h, w)
    return root_tree_euler_batched(chosen, h, w, max_depth)
