"""Multi-scale deformable-attention sampling with a Pallas TPU backward.

The reference consumes mmcv's CUDA ``ms_deform_attn`` kernel
(reference: mmdet/models/utils/transformer.py:23; CUDA backward does
atomicAdd scatters). On TPU the XLA formulation's backward lowers to
688k-row scatter-adds per (level, layer) — ~24 ms/layer at Box2Mask LSJ
shapes, the single largest cost in the step (see
docs/tpu_performance_notes.md "scatter-add is row-count bound").

This module provides ``msda_sample_psum`` — the weighted-sample +
point-sum primitive — with a custom VJP whose d(value) runs as a
windowed one-hot-matmul Pallas kernel:

* Encoder queries sit on static grids, so each sample's target cell is
  its STATIC base position plus a small learned offset. Samples are
  processed against disjoint target-row ranges; for each range the
  contributing samples form STATIC contiguous runs (per query
  section), computed in numpy at trace time.
* Samples stay in their NATURAL (bh, query, point) order — all the
  kernel inputs (corner weights, cell indices, upstream grad) are pure
  reshapes of tensors the VJP needs anyway, so the kernel consumes
  them with zero repacking passes (an earlier p-major layout spent
  38 ms/step materializing packed operands).
* Each kernel visit loads one sample chunk (contiguous — no gather!)
  of XLA-precomputed update rows ``u = w4 (x) g`` and accumulates
  ``one_hot(cell)^T @ u`` into the range's (RNG, 4c) block on the MXU
  (see ``_MODE`` below for the measured end-to-end history: the XLA
  scatter's 555 ms step is 311.9 ms with this kernel + the
  relayout-free XLA fwd/rdot).
* EXACTNESS: a sample whose offset exceeds the static window margin
  cannot be handled by its runs. The wrapper checks this per call
  (elementwise compare vs static bounds) and `lax.cond`-falls back to
  the XLA scatter, so results are always exact; the fast path is taken
  whenever every |offset| <= ~MARGIN_ROWS rows (true at init, where
  offsets start at <= num_points+1 cells, and for typically-trained
  offsets).

Forward and the backward rdot default to XLA (flat patch row-gathers
are already near the gather row-count floor; the opt-in one-hot-matmul
kernels for them measured slower — see ``_MODE``). The custom VJP
recomputes the gathered rows in the backward instead of saving them:
at LSJ shapes that residual was 176 MB per (level, layer).
"""
from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from .patch import bilinear_patch_table

# kernel tile parameters (measured optimum on v5e; see
# docs/tpu_performance_notes.md)
CH = int(os.environ.get("MSDA_CH", "512"))     # samples per chunk (must divide section sizes)
RNG = int(os.environ.get("MSDA_RNG", "768"))   # target cells per output block
MARGIN_ROWS = int(os.environ.get("MSDA_MARGIN", "8"))  # static offset window, target-level rows

_FORCE_INTERPRET = False   # tests flip this to run the kernel on CPU

# Which fast paths run on TPU (env MSDA_PALLAS):
#   'all'    — fwd + rdot + d(patch) Pallas kernels
#   'dvalue' — only the d(patch) kernel; fwd/rdot stay XLA gathers
#   'off'    — pure XLA everywhere
# Default chosen by end-to-end Box2Mask R50 LSJ b1 step time on a real
# v5e (steady-state, state-threaded timing; max_matched=100 recipe).
# Round-3 kernels measured: all 668 ms | off 555 ms | dvalue 470 ms —
# d(patch) replaces XLA's serialized scatter-add; the fwd/rdot
# one-hot-matmul kernels move ~4x the useful bytes per sample and lose
# ~200 ms to XLA's native gathers, so they are opt-in only. Round 4
# took 'dvalue' to 311.9 ms: the kernel's update rows are precomputed
# in XLA, and the XLA fwd/rdot keep every (N, 4c) <-> (N, 4, c) tile
# relayout out of the hot path via tiny constant matmuls (see
# docs/tpu_performance_notes.md "Round-4"; the slice/column-broadcast
# alternative measured 100 ms WORSE — don't re-try it).
_MODE = os.environ.get('MSDA_PALLAS', 'dvalue')


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ('cpu', 'gpu')
    except Exception:
        return False


@functools.lru_cache(maxsize=64)
def _visit_tables(bh: int, h: int, w: int,
                  query_grids: Tuple[Tuple[int, int], ...], p: int,
                  ch: int, rng_: int, marg_rows: int):
    """Static visit schedule for the d(patch) kernel (all numpy).

    Sample order inside the kernel arrays is the NATURAL flattening
    (bh, query, point): all p points of a query are adjacent and share
    the query's static base cell, so per-section runs stay contiguous.
    Returns None if shapes are ineligible (section sample counts not
    divisible by ch, or ch not divisible by p).
    """
    ph, pw = h + 1, w + 1
    cells = ph * pw
    sizes = [gh * gw for gh, gw in query_grids]
    if ch % p or any((s * p) % ch for s in sizes):
        return None
    l_tot = sum(sizes)
    n = bh * l_tot * p
    rng_ = min(rng_, -(-cells // 128) * 128)
    marg = marg_rows * pw
    nr = -(-cells // rng_)

    bases = []
    for (gh, gw) in query_grids:
        qy, qx = np.mgrid[0:gh, 0:gw]
        # mirror the f32 forward arithmetic so float rounding at cell
        # boundaries cannot disagree with the traced computation
        ry = ((qy + 0.5) / gh).astype(np.float32) * np.float32(h) \
            - np.float32(0.5)
        rx = ((qx + 0.5) / gw).astype(np.float32) * np.float32(w) \
            - np.float32(0.5)
        py = np.floor(ry).astype(np.int64) + 1
        px = np.floor(rx).astype(np.int64) + 1
        bases.append((py * pw + px).reshape(-1))
    a_off = np.cumsum([0] + sizes)

    vk, vs, vbase, vzero = [], [], [], []
    lo_s = np.full(n, 2**30, np.int64)
    hi_s = np.full(n, -1, np.int64)
    nk = bh * nr
    for bhi in range(bh):
        for r in range(nr):
            k = bhi * nr + r
            first = True
            for a, bq in enumerate(bases):
                sel = np.nonzero((bq >= r * rng_ - marg) &
                                 (bq < (r + 1) * rng_ + marg))[0]
                if sel.size == 0:
                    continue
                la = sizes[a]
                run0 = (bhi * l_tot + a_off[a]) * p
                s0 = max(((run0 + sel[0] * p) // ch) * ch, run0)
                s1 = run0 + (sel[-1] + 1) * p
                nchunks = -(-(s1 - s0) // ch)
                # section sample runs are ch-divisible so rounded
                # chunks never cross into the next (section/bh) run
                assert s0 + nchunks * ch <= run0 + la * p
                for j in range(nchunks):
                    vk.append(k)
                    vs.append(s0 // ch + j)
                    vbase.append(r * rng_)
                    vzero.append(1 if first else 0)
                    first = False
                send = s0 + nchunks * ch
                lo_s[s0:send] = np.minimum(lo_s[s0:send], r * rng_)
                hi_s[s0:send] = np.maximum(hi_s[s0:send],
                                           (r + 1) * rng_)
            if first:
                vk.append(k); vs.append(0)
                vbase.append(-2**20); vzero.append(1)
    return dict(
        vk=np.asarray(vk, np.int32), vs=np.asarray(vs, np.int32),
        vbase=np.asarray(vbase, np.int32),
        vzero=np.asarray(vzero, np.int32),
        lo=lo_s.astype(np.int32), hi=hi_s.astype(np.int32),
        nr=nr, rng=rng_, nk=nk, cells=cells)


@functools.lru_cache(maxsize=64)
def _fwd_visit_tables(bh: int, h: int, w: int,
                      query_grids: Tuple[Tuple[int, int], ...], p: int,
                      ch: int, rng_: int, marg_rows: int):
    """Static visit schedule for the FORWARD sampling / backward rdot
    kernels (all numpy). Unlike ``_visit_tables`` (ordered by target
    block so d(patch) blocks accumulate consecutively), this schedule is
    ordered by SAMPLE CHUNK: the per-chunk output block stays VMEM
    resident across its (few) target-block visits, and each sample's
    cell lands in exactly one visited block so outputs accumulate
    exactly once.

    Index space here is the (h+1, w+1) PATCH-ROW table (flat stride
    w+1), the same one the d(patch) kernel scatters into: row j holds
    the four bilinear corners [TL, TR, BL, BR] of cell j, materialized
    by XLA as shifted dense slices of the zero-padded value. An earlier
    revision rebuilt corner rows inside the kernel from shifted slices
    of the padded-value plane, but Mosaic cannot lower the required
    lane-concatenate/rotate of offset or bf16 operands (compiler crash
    at Box2Mask LSJ shapes) — the materialized patch keeps the kernel a
    pure one-hot MXU matmul. Returns None if shapes are ineligible.
    """
    pw1 = w + 1
    cells = (h + 1) * pw1              # patch-row count
    sizes = [gh * gw for gh, gw in query_grids]
    if ch % p or any((s * p) % ch for s in sizes):
        return None
    l_tot = sum(sizes)
    n = bh * l_tot * p
    rng_ = min(rng_, -(-cells // 128) * 128)
    marg = marg_rows * pw1
    nr = -(-cells // rng_)

    bases = []
    for (gh, gw) in query_grids:
        qy, qx = np.mgrid[0:gh, 0:gw]
        ry = ((qy + 0.5) / gh).astype(np.float32) * np.float32(h) \
            - np.float32(0.5)
        rx = ((qx + 0.5) / gw).astype(np.float32) * np.float32(w) \
            - np.float32(0.5)
        py = np.floor(ry).astype(np.int64) + 1
        px = np.floor(rx).astype(np.int64) + 1
        bases.append((py * pw1 + px).reshape(-1))
    a_off = np.cumsum([0] + sizes)

    nchunks = n // ch
    vs, vr, vz, vbh = [], [], [], []
    lo_s = np.zeros(n, np.int64)
    hi_s = np.zeros(n, np.int64)
    for i in range(nchunks):
        s0 = i * ch
        bhi = s0 // (l_tot * p)
        rem = s0 - bhi * l_tot * p
        a = int(np.searchsorted(a_off[1:] * p, rem, side='right'))
        qlo = rem // p - a_off[a]
        qhi = qlo + ch // p
        bq = bases[a][qlo:qhi]
        r0 = max(int(bq.min() - marg) // rng_, 0)
        r1 = min(int(bq.max() + marg) // rng_, nr - 1)
        for j, r in enumerate(range(r0, r1 + 1)):
            vs.append(i)
            vr.append(r)
            vz.append(1 if j == 0 else 0)
            vbh.append(bhi)
        lo_s[s0:s0 + ch] = r0 * rng_
        hi_s[s0:s0 + ch] = (r1 + 1) * rng_
    return dict(
        vs=np.asarray(vs, np.int32), vr=np.asarray(vr, np.int32),
        vz=np.asarray(vz, np.int32), vbh=np.asarray(vbh, np.int32),
        lo=lo_s.astype(np.int32), hi=hi_s.astype(np.int32),
        nr=nr, rng=rng_, cells=cells, nchunks=nchunks)


def _geom2(value_shape, loc_x, loc_y, weight):
    """Per-sample geometry in the PATCH-ROW index space (flat stride
    w+1, matching ``_fwd_visit_tables`` and the d(patch) kernel):
    top-left cell index, f32 corner weights (ok & attention folded),
    and the raw (wx, wy, ok) pieces the VJP needs."""
    _, h, w, _ = value_shape
    x = loc_x * w - 0.5
    y = loc_y * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    ok = ((x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1))
    xi = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)
    yi = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)
    idxp = yi * (w + 1) + xi                             # (BH, S)
    w4 = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                    wy * (1 - wx), wy * wx], axis=-1)    # (BH, S, 4)
    w4 = (w4 * (ok * weight)[..., None]).astype(jnp.float32)
    return idxp, w4, (wx, wy, ok)


def _patchflat(value, rng_, nr):
    """(BH, H, W, c) -> (BH, nr*rng_, 4c) materialized bilinear patch
    rows [TL, TR, BL, BR] per (h+1, w+1) cell, zero-padded to the block
    grid — dense XLA slices of the padded value, built INSIDE the fast
    branch of the dispatch cond so the fallback never pays for it."""
    b, h, w, c = value.shape
    patch = bilinear_patch_table(value)
    flat = patch.reshape(b, (h + 1) * (w + 1), 4 * c)
    extra = nr * rng_ - flat.shape[1]
    return jnp.pad(flat, ((0, 0), (0, extra), (0, 0)))


def _fwd_kernel_factory(rng_, ch, p, c):
    from jax.experimental import pallas as pl

    def kernel(vs_r, vr_r, vz_r, vbh_r, idx_s, w_s, patch_r, out_ref):
        v = pl.program_id(0)

        @pl.when(vz_r[v] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        rel = idx_s[0, :] - vr_r[v] * rng_

        @pl.when(jnp.any((rel >= 0) & (rel < rng_)))
        def _():
            patch = patch_r[0]                             # (rng_, 4c)
            # one-hot row pick: exact regardless of dtype (each output
            # element is a single patch value, f32-accumulated)
            oh = (rel[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (ch, rng_), 1)).astype(patch.dtype)
            vals = jax.lax.dot_general(
                oh, patch,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (ch, 4c)
            u = sum(w_s[:, k:k + 1] * vals[:, k * c:(k + 1) * c]
                    for k in range(4))                     # f32 (ch, c)
            # point-sum via a 0/1 fold matrix in f32 (exact)
            qi = jax.lax.broadcasted_iota(jnp.int32, (ch // p, ch), 0)
            si = jax.lax.broadcasted_iota(jnp.int32, (ch // p, ch), 1)
            fold = (si // p == qi).astype(jnp.float32)
            out_ref[:] += jax.lax.dot_general(
                fold, u,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (ch//p, c)

    return kernel


def _rdot_kernel_factory(rng_, ch, p, c):
    from jax.experimental import pallas as pl

    def kernel(vs_r, vr_r, vz_r, vbh_r, idx_s, g_s, patch_r, out_ref):
        v = pl.program_id(0)

        @pl.when(vz_r[v] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        rel = idx_s[0, :] - vr_r[v] * rng_

        @pl.when(jnp.any((rel >= 0) & (rel < rng_)))
        def _():
            patch = patch_r[0]                             # (rng_, 4c)
            oh = (rel[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (ch, rng_), 1)).astype(patch.dtype)
            vals = jax.lax.dot_general(
                oh, patch,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (ch, 4c)
            # per-sample grad rows via the repeat matmul (f32: exact)
            qi = jax.lax.broadcasted_iota(jnp.int32, (ch, ch // p), 0)
            ri = jax.lax.broadcasted_iota(jnp.int32, (ch, ch // p), 1)
            g_rep = jax.lax.dot_general(
                (qi // p == ri).astype(jnp.float32),
                g_s[:].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (ch, c)
            # assemble (ch, 4) without a lane-concatenate (see
            # _patch_block_from_rows): broadcast each corner's scalar
            # column against a 0/1 lane mask and add
            col = jax.lax.broadcasted_iota(jnp.int32, (ch, 4), 1)
            out_ref[:] += sum(
                jnp.sum(vals[:, k * c:(k + 1) * c] * g_rep, axis=1,
                        keepdims=True) * (col == k).astype(jnp.float32)
                for k in range(4))                         # (ch, 4)

    return kernel


def _fwd_rdot_pallas(kernel_factory, out_block, out_rows, idxp_flat,
                     aux_flat, patchflat, tables, p, c):
    """Shared pallas_call driver for the fwd-sampling and rdot kernels.

    idxp_flat: (1, N) i32 patch-row cells; aux_flat: (N, 4) f32 w4
    (fwd) or (N//p, c) f32 grad rows (rdot); patchflat: (BH, nr*rng,
    4c). Returns (nchunks*out_block0, out_block1) f32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng_ = tables['rng']
    nv = tables['vs'].shape[0]
    kernel = kernel_factory(rng_, CH, p, c)
    if aux_flat.shape[0] == idxp_flat.shape[1]:      # (N, 4) w4
        aux_spec = pl.BlockSpec((CH, 4), lambda v, vs, vr, vz, vbh:
                                (vs[v], 0), memory_space=pltpu.VMEM)
    else:                                            # (N//p, c) grads
        aux_spec = pl.BlockSpec((CH // p, c), lambda v, vs, vr, vz, vbh:
                                (vs[v], 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nv,),
        in_specs=[
            pl.BlockSpec((1, CH), lambda v, vs, vr, vz, vbh:
                         (0, vs[v]), memory_space=pltpu.VMEM),
            aux_spec,
            pl.BlockSpec((1, rng_, 4 * c), lambda v, vs, vr, vz, vbh:
                         (vbh[v], vr[v], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (out_block[0], out_block[1]), lambda v, vs, vr, vz, vbh:
            (vs[v], 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, out_block[1]),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=_FORCE_INTERPRET,
    )(jnp.asarray(tables['vs']), jnp.asarray(tables['vr']),
      jnp.asarray(tables['vz']), jnp.asarray(tables['vbh']),
      idxp_flat, aux_flat, patchflat)


def _dpatch_kernel_factory(rng_, ch, d):
    from jax.experimental import pallas as pl

    def kernel(vk_r, vs_r, vb_r, vz_r, idx_s, u_s, out_ref):
        v = pl.program_id(0)

        @pl.when(vz_r[v] == 1)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        base = vb_r[v]
        rel = idx_s[0, :] - base

        # the static visit window assumes worst-case |offset| <=
        # MARGIN_ROWS, so a chunk is scheduled against ~3-4 adjacent
        # cell blocks — but ACTUAL offsets are tiny (<= 1-2 cells at
        # init and for typically-trained weights), leaving most margin
        # visits with zero in-block samples. Predicating the MXU
        # matmul on a dynamic hit test skips the kernel's dominant
        # cost on those visits while staying exact: skipped visits
        # contribute only zeros.
        @pl.when(jnp.any((rel >= 0) & (rel < rng_)))
        def _():
            # the per-sample update rows u = w4 (x) g_rep are
            # PRECOMPUTED in XLA (dense elementwise, ~0.4 ms of HBM
            # traffic) — an earlier revision assembled them in-kernel
            # from (w4, g) via a repeat-matmul + lane masks, which
            # dominated the per-visit cost (~3 us/visit measured; the
            # one-hot matmul alone is ~0.3 us at these tiles).
            oh_t = (rel[None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (rng_, ch), 0)).astype(jnp.bfloat16)
            out_ref[0] += jax.lax.dot_general(
                oh_t, u_s[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    return kernel


def _dpatch_pallas(idx_flat, u_flat, tables, bh, d):
    """idx_flat: (1, N) i32 cell indices; u_flat: (N, 4d) bf16 update
    rows (w4 (x) per-query grad, natural (bh, query, point) order).
    Returns (BH, CELLS, 4d) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng_ = tables['rng']
    nk = tables['nk']
    nv = tables['vk'].shape[0]
    kernel = _dpatch_kernel_factory(rng_, CH, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nv,),
        in_specs=[
            pl.BlockSpec((1, CH), lambda v, vk, vs, vb, vz:
                         (0, vs[v]), memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, 4 * d), lambda v, vk, vs, vb, vz:
                         (vs[v], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rng_, 4 * d), lambda v, vk, vs, vb, vz:
            (vk[v], 0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nk, rng_, 4 * d), jnp.float32),
        grid_spec=grid_spec,
        interpret=_FORCE_INTERPRET,
    )(jnp.asarray(tables['vk']), jnp.asarray(tables['vs']),
      jnp.asarray(tables['vbase']), jnp.asarray(tables['vzero']),
      idx_flat, u_flat)
    nr = tables['nr']
    return out.reshape(bh, nr * rng_, 4 * d)[:, :tables['cells']]


def _corner_geom(value, loc_x, loc_y):
    """Shared forward geometry: padded patch table, flat row index per
    sample (with bh offset), and the raw (wx, wy, ok) planes — all
    (BH, S) arrays with perfect (8, 128) tiling. The (BH, S, 4)
    corner-weight STACK is deliberately not built here: a 4-lane
    minormost axis pads to 128 lanes physically (32x memory blowup,
    ~0.7 GB of HBM traffic per (level, layer) at LSJ shapes, profiled
    as 'data formatting'); consumers either fold the stack lazily
    (XLA tail) or rebuild corner weights in VMEM (post-gather kernel).

    value: (BH, H, W, c); loc_*: (BH, S) f32 with S = L*P.
    """
    b, h, w, c = value.shape
    x = loc_x * w - 0.5
    y = loc_y * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    ok = ((x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1))
    xi = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)
    yi = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)
    idx_local = yi * (w + 1) + xi                        # (BH, S)
    patch = bilinear_patch_table(value)
    flat = patch.reshape(b * (h + 1) * (w + 1), 4 * c)
    base_bh = (jnp.arange(b, dtype=jnp.int32)
               * ((h + 1) * (w + 1)))[:, None]
    return flat, idx_local, base_bh, (wx, wy, ok)


def _corner_w4(wx, wy, ok, weight):
    """(BH, S, 4) corner-weight stack (ok & attention folded) — the
    XLA tail's operand; op order matches the historical _corner_data
    exactly."""
    w4 = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                    wy * (1 - wx), wy * wx], axis=-1)    # (BH, S, 4)
    return w4 * (ok * weight)[..., None]


# Split the flat patch-row gathers into groups along the bh axis:
# random-access cost grows with TABLE footprint on TPU (gathers from
# tables <= ~34 MB measured ~6x faster per row than from 176 MB — see
# docs/tpu_performance_notes.md "scatter-add is row-count bound").
# 0 = one folded gather (historical default); n = n groups.
_SPLIT = int(os.environ.get('MSDA_SPLIT', '0'))


def _take_rows_grouped(flat, idx_local, base_bh, bh, rows_per_bh, width):
    """Gather (bh*rows_per_bh) rows from the per-bh-sectioned ``flat``
    table, optionally as ``_SPLIT`` independent smaller-table gathers."""
    groups = _SPLIT if _SPLIT > 1 and bh % _SPLIT == 0 else 1
    if groups == 1:
        idx = (idx_local + base_bh).reshape(-1)
        return jnp.take(flat, idx, axis=0)
    per = bh // groups
    section = flat.shape[0] // bh
    flat_g = flat.reshape(groups, per * section, width)
    base_g = (jnp.arange(per, dtype=jnp.int32) * section)[:, None]
    outs = [
        jnp.take(flat_g[g],
                 (idx_local[g * per:(g + 1) * per] + base_g).reshape(-1),
                 axis=0)
        for g in range(groups)
    ]
    return jnp.concatenate(outs, axis=0)


@functools.lru_cache(maxsize=8)
def _corner_expand_mat(c):
    """(4, 4c) 0/1 matrix: w4 @ T broadcasts corner k over its c lanes."""
    t = np.zeros((4, 4 * c), np.float32)
    for k in range(4):
        t[k, k * c:(k + 1) * c] = 1.0
    return t


@functools.lru_cache(maxsize=8)
def _corner_fold_mat(c):
    """(4c, c) 0/1 matrix: prod @ C sums the 4 corners per channel."""
    m = np.zeros((4 * c, c), np.float32)
    for k in range(4):
        for j in range(c):
            m[k * c + j, j] = 1.0
    return m


@functools.lru_cache(maxsize=8)
def _corner_seg_mat(c):
    """(4c, 4) 0/1 matrix: prod @ S sums each corner's c lanes."""
    m = np.zeros((4 * c, 4), np.float32)
    for k in range(4):
        m[k * c:(k + 1) * c, k] = 1.0
    return m


def _postgather_fwd_kernel_factory(ch, p, c, quant):
    """Corner-weight + corner-fold + point-sum over one gathered
    chunk, entirely in VMEM. Geometry arrives as (1, ch) LANE vectors
    (the natural tiling of the (BH, S) planes); the identity-matmul
    dot_general transposes them to (ch, 1) sample columns on the MXU
    (dot_general contracts lanes of both operands, so no relayout).
    ``quant`` mirrors the XLA tail's bf16 product contract exactly:
    w4 and each corner product round to bf16, corner/point sums stay
    f32 (bf16 products have 8-bit significands, so the 4-term f32
    corner sum is EXACT and order-independent)."""
    from jax.experimental import pallas as pl

    def kernel(rows_ref, wx_ref, wy_ref, ok_ref, wt_ref, id_ref,
               out_ref):
        idm = id_ref[...]
        bi = pl.program_id(0)
        qi = jax.lax.broadcasted_iota(jnp.int32, (ch // p, ch), 0)
        si = jax.lax.broadcasted_iota(jnp.int32, (ch // p, ch), 1)
        fold = (si // p == qi).astype(jnp.float32)

        # the block carries _POSTGATHER_KCH sub-chunks of ch samples
        # each (one big block per grid step: 24k single-chunk steps
        # measured SLOWER than the XLA tail from per-step overhead
        # alone); each sub-chunk is processed with STATIC sub-slices
        for j in range(_POSTGATHER_KCH):
            def col(r):   # (B, kch*ch) block row bi -> (ch, 1) column
                row = r[pl.dslice(bi, 1), j * ch:(j + 1) * ch]
                return jax.lax.dot_general(
                    idm, row.astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

            wxc = col(wx_ref)
            wyc = col(wy_ref)
            okw = col(ok_ref) * col(wt_ref)
            rows = rows_ref[j * ch:(j + 1) * ch, :]
            terms = ((1 - wyc) * (1 - wxc), (1 - wyc) * wxc,
                     wyc * (1 - wxc), wyc * wxc)
            u = jnp.zeros((ch, c), jnp.float32)
            for k in range(4):
                w4k = terms[k] * okw
                if quant:
                    w4k = w4k.astype(jnp.bfloat16).astype(jnp.float32)
                prod = rows[:, k * c:(k + 1) * c].astype(
                    jnp.float32) * w4k
                if quant:
                    prod = prod.astype(jnp.bfloat16).astype(jnp.float32)
                u = u + prod
            out_ref[j * (ch // p):(j + 1) * (ch // p), :] = \
                jax.lax.dot_general(
                    fold, u,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (ch//p, c)

    return kernel


def _postgather_fwd_pallas(rows, wx, wy, ok, wt, p, c):
    """rows: (B*S, 4c) gathered patch rows; wx/wy/ok/wt: (B, S) f32
    geometry planes. Returns (B*S//p, c) f32 point-summed samples."""
    from jax.experimental import pallas as pl

    b, s = wx.shape
    ch = CH
    kch = _POSTGATHER_KCH
    big = ch * kch
    nblocks = s // big
    kernel = _postgather_fwd_kernel_factory(
        ch, p, c, rows.dtype == jnp.bfloat16)
    idm = jnp.eye(ch, dtype=jnp.float32)
    # geometry blocks span ALL b sublane rows (Pallas requires the
    # block's second-to-last dim be 8-divisible or array-equal); the
    # kernel dynamically selects its bh row
    geom_spec = pl.BlockSpec((b, big), lambda bi, ci: (0, ci))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * s // p, c), jnp.float32),
        grid=(b, nblocks),
        in_specs=[
            pl.BlockSpec((big, 4 * c),
                         lambda bi, ci: (bi * nblocks + ci, 0)),
            geom_spec, geom_spec, geom_spec, geom_spec,
            pl.BlockSpec((ch, ch), lambda bi, ci: (0, 0)),
        ],
        out_specs=pl.BlockSpec((big // p, c),
                               lambda bi, ci: (bi * nblocks + ci, 0)),
        interpret=_FORCE_INTERPRET or (_FORCE_POSTGATHER
                                       and not _on_tpu()),
    )(rows, wx, wy, ok, wt, idm)


_FORCE_POSTGATHER = False  # tests flip this to exercise the kernel
                           # (interpreted) on CPU; _FORCE_INTERPRET is
                           # NOT used here because _sample_psum_ref
                           # doubles as the tests' AUTODIFF oracle and
                           # pallas_call has no AD rule


_POSTGATHER_KCH = int(os.environ.get('MSDA_POSTGATHER_KCH', '8'))


def _postgather_ok(s, p, c):
    """Gate for the post-gather fusion kernel (env MSDA_POSTGATHER).

    Default OFF: measured end-to-end on the Box2Mask R50 LSJ b1 step
    (v5e) the kernel LOSES to the XLA tail — 294.3 ms at one chunk per
    grid step (24k steps/call: per-step overhead alone swamps the
    win), 289.5 ms at 8 sub-chunks per step, vs 282.3 ms for the XLA
    tail with same-dtype copy dots. The (N, 4)-stack / (N, 4c)
    intermediate traffic this kernel avoids is evidently cheaper than
    the kernel's own per-chunk transpose dots + f32<->bf16 cast chains
    at these shapes. Kept opt-in for re-testing on future toolchains."""
    enabled = (os.environ.get('MSDA_POSTGATHER', '0') != '0'
               and _on_tpu()) or _FORCE_POSTGATHER
    return enabled and s % (CH * _POSTGATHER_KCH) == 0 and CH % p == 0


def _sample_psum_ref(value, loc_x, loc_y, weight, p):
    """Forward: out[bh, l, c] = sum_p w4 . rows.

    The gather stays XLA (near the row-count floor); the corner
    weighting/folding after it runs as a post-gather Pallas kernel on
    TPU — the XLA tail below materializes a physically 32x-padded
    (N, 4) stack plus (N, 4c) w4t/prod intermediates (~1.4 GB of HBM
    traffic per (level, layer) at LSJ shapes). Everything in the tail
    stays in the (rows, 4c)-lane layout: splitting the gathered 4c
    lanes into a (..., 4, c) axis is a PHYSICAL tile relayout on TPU
    (~1.7 ms per (level, layer) at LSJ shapes, profiled)."""
    b = value.shape[0]
    c = value.shape[-1]
    flat, idx_local, base_bh, (wx, wy, ok) = _corner_geom(
        value, loc_x, loc_y)
    s = idx_local.shape[1]
    rows = _take_rows_grouped(flat, idx_local, base_bh, b, s, 4 * c)
    if _postgather_ok(s, p, c):
        out = _postgather_fwd_pallas(
            rows, wx, wy, ok.astype(jnp.float32),
            weight.astype(jnp.float32), p, c)
        return out.reshape(b, s // p, c).astype(value.dtype)
    w4 = _corner_w4(wx, wy, ok, weight)
    # the expand dot only COPIES w4 values (0/1 matrix), so emitting
    # rows.dtype directly is bit-identical to the earlier
    # f32-dot-then-astype — but skips materializing an f32 (N, 4c)
    # intermediate (~350 MB of HBM traffic per (level, layer) at LSJ
    # shapes; dot outputs don't fuse into elementwise consumers)
    w4t = jnp.dot(w4.reshape(b * s, 4).astype(rows.dtype),
                  jnp.asarray(_corner_expand_mat(c)).astype(rows.dtype),
                  preferred_element_type=rows.dtype)        # (N, 4c)
    prod = rows * w4t                      # products in rows' dtype
    out = jnp.dot(prod, jnp.asarray(_corner_fold_mat(c)).astype(
        prod.dtype), preferred_element_type=jnp.float32)    # (N, c) f32
    return out.reshape(b, s // p, p, c).sum(axis=2).astype(value.dtype)


def msda_sample_psum(value, loc_x, loc_y, weight,
                     query_grids: Sequence[Tuple[int, int]]):
    """Deformable-attention sampling for one target level.

    value: (BH, H, W, c) level features (one head's channels);
    loc_x/loc_y: (BH, L, P) normalized sampling locations;
    weight: (BH, L, P) attention weights;
    query_grids: static (h, w) of each query section (sum h*w = L).
    Returns (BH, L, c) = sum_p weight * bilinear_sample(value, loc).
    """
    return _msda_sample_psum(value, loc_x, loc_y, weight,
                             tuple(tuple(g) for g in query_grids))


def _eligible(c, query_grids, l):
    """Gate for the fwd/rdot kernels (mode 'all' only)."""
    mode_ok = _MODE == 'all' or _FORCE_INTERPRET
    return mode_ok and (c % 32 == 0) \
        and (_on_tpu() or _FORCE_INTERPRET) \
        and sum(gh * gw for gh, gw in query_grids) == l


def _xla_sample_f32(value, idxp, w4, p):
    """XLA forward with f32 accumulation — the exact-math twin of the
    Pallas forward kernel, used as its out-of-window ``lax.cond``
    fallback (identical products & summation order, so one escaped
    offset cannot shift numerics call-wide). The patch/gather table is
    built HERE, inside the branch, so the hot path never gathers it."""
    b, h, w, c = value.shape
    s = idxp.shape[1]
    patch = bilinear_patch_table(value)
    flat = patch.reshape(b * (h + 1) * (w + 1), 4 * c)
    base_bh = (jnp.arange(b, dtype=jnp.int32)
               * ((h + 1) * (w + 1)))[:, None]
    rows = _take_rows_grouped(flat, idxp, base_bh, b, s,
                              4 * c).reshape(b, s, 4, c)
    out = (rows.astype(jnp.float32) * w4[..., None]).sum(axis=2)
    return out.reshape(b, s // p, p, c).sum(axis=2)     # f32


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _msda_sample_psum(value, loc_x, loc_y, weight, query_grids):
    b, l, p = loc_x.shape
    bh, h, w, c = value.shape
    ftables = _fwd_visit_tables(bh, h, w, query_grids, p, CH, RNG,
                                MARGIN_ROWS) \
        if _eligible(c, query_grids, l) else None
    if ftables is None:
        return _sample_psum_ref(value, loc_x.reshape(b, l * p),
                                loc_y.reshape(b, l * p),
                                weight.reshape(b, l * p), p)
    lx = loc_x.reshape(b, l * p)
    ly = loc_y.reshape(b, l * p)
    wt = weight.reshape(b, l * p)
    idxp, w4, _ = _geom2(value.shape, lx, ly, wt)
    lo = jnp.asarray(ftables['lo'])
    hi = jnp.asarray(ftables['hi'])
    idxp_flat = idxp.reshape(1, -1)
    in_window = jnp.all((idxp_flat[0] >= lo) & (idxp_flat[0] < hi))

    def fast(_):
        patchflat = _patchflat(value, ftables['rng'], ftables['nr'])
        out = _fwd_rdot_pallas(
            _fwd_kernel_factory, (CH // p, c), ftables['nchunks'] * CH // p,
            idxp_flat, w4.reshape(-1, 4), patchflat, ftables, p, c)
        return out.reshape(b, l, c)

    out = jax.lax.cond(in_window, fast,
                       lambda _: _xla_sample_f32(value, idxp, w4, p), None)
    return out.astype(value.dtype)


def _fwd(value, loc_x, loc_y, weight, query_grids):
    out = _msda_sample_psum(value, loc_x, loc_y, weight, query_grids)
    return out, (value, loc_x, loc_y, weight)


def _bwd(query_grids, res, g):
    value, loc_x, loc_y, weight = res
    bh, h, w, c = value.shape
    _, l, p = loc_x.shape
    s = l * p
    lx = loc_x.reshape(bh, s)
    ly = loc_y.reshape(bh, s)
    wt = weight.reshape(bh, s)
    idxp, w4, (wx, wy, ok) = _geom2(value.shape, lx, ly, wt)
    base_bh = (jnp.arange(bh, dtype=jnp.int32)
               * ((h + 1) * (w + 1)))[:, None]
    idx = (idxp + base_bh).reshape(-1)
    g_f = g.astype(jnp.float32)

    ftables = _fwd_visit_tables(bh, h, w, query_grids, p, CH, RNG,
                                MARGIN_ROWS) \
        if _eligible(c, query_grids, l) else None

    def _xla_rdot(quantize):
        # recompute rows (gather) instead of saving the (N, 4c) rows
        # tensor as a residual (176 MB per level/layer at LSJ shapes).
        # quantize=False keeps the historical rows-dtype contraction
        # (an f32 cast would materialize the rows tensor — measured
        # 73 ms/step); quantize=True mirrors the Pallas rdot kernel's
        # exact f32 products so the two lax.cond branches agree.
        patch = bilinear_patch_table(value)
        flat = patch.reshape(bh * (h + 1) * (w + 1), 4 * c)
        if quantize:
            # exactness twin of the Pallas rdot kernel ('all' mode):
            # keep the historical (..., 4, c)-axis formulation so the
            # two lax.cond branches agree bit-for-bit
            rows = _take_rows_grouped(flat, idxp, base_bh, bh, s,
                                      4 * c).reshape(bh, l, p, 4, c)
            return (rows.astype(jnp.float32)
                    * g_f[:, :, None, None, :]).sum(-1)
        # hot path (mode 'dvalue'): stay in the (N, 4c)-lane layout —
        # splitting 4c lanes into a (4, c) axis is a physical tile
        # relayout (~1.7 ms per (level, layer) at LSJ shapes, profiled).
        # Tile g across the 4 corner blocks and fold each corner's c
        # lanes with tiny 0/1 constant matmuls instead.
        rows = _take_rows_grouped(flat, idxp, base_bh, bh, s, 4 * c)
        g_rep = jnp.repeat(g.astype(rows.dtype).reshape(bh * l, c), p,
                           axis=0)                          # (N, c)
        # pure-copy dot (0/1 tiling matrix): emit rows.dtype directly
        # instead of materializing an f32 (N, 4c) intermediate
        g_t = jnp.dot(g_rep,
                      jnp.asarray(_corner_fold_mat(c).T).astype(
                          rows.dtype),
                      preferred_element_type=rows.dtype)    # (N, 4c)
        prod = rows * g_t
        rdot4 = jnp.dot(prod,
                        jnp.asarray(_corner_seg_mat(c)).astype(
                            prod.dtype),
                        preferred_element_type=jnp.float32)  # (N, 4)
        return rdot4.reshape(bh, l, p, 4)

    if ftables is None:
        rdot = _xla_rdot(quantize=False)                  # (BH,L,P,4)
    else:
        lo2 = jnp.asarray(ftables['lo'])
        hi2 = jnp.asarray(ftables['hi'])
        idxp_flat = idxp.reshape(1, -1)
        in_window2 = jnp.all((idxp_flat[0] >= lo2)
                             & (idxp_flat[0] < hi2))

        def fast_rdot(_):
            patchflat = _patchflat(value, ftables['rng'], ftables['nr'])
            out = _fwd_rdot_pallas(
                _rdot_kernel_factory, (CH, 4),
                ftables['nchunks'] * CH, idxp_flat,
                g_f.reshape(bh * l, c), patchflat, ftables, p, c)
            return out.reshape(bh, l, p, 4)

        rdot = jax.lax.cond(in_window2, fast_rdot,
                            lambda _: _xla_rdot(quantize=True), None)
    wxr = wx.reshape(bh, l, p)
    wyr = wy.reshape(bh, l, p)
    okw = (ok.reshape(bh, l, p) * wt.reshape(bh, l, p)).astype(
        jnp.float32)
    cw = jnp.stack([(1 - wyr) * (1 - wxr), (1 - wyr) * wxr,
                    wyr * (1 - wxr), wyr * wxr], axis=-1)
    d_weight = (ok.reshape(bh, l, p).astype(jnp.float32)
                * (cw * rdot).sum(-1)).astype(weight.dtype)
    d_wx = okw * ((1 - wyr) * (rdot[..., 1] - rdot[..., 0])
                  + wyr * (rdot[..., 3] - rdot[..., 2]))
    d_wy = okw * ((1 - wxr) * (rdot[..., 2] - rdot[..., 0])
                  + wxr * (rdot[..., 3] - rdot[..., 1]))
    d_loc_x = (d_wx * w).astype(loc_x.dtype)
    d_loc_y = (d_wy * h).astype(loc_y.dtype)

    # --- d(value) via d(patch) ---
    # g at sample granularity: u_row(sample) = w4 (x) g[query]
    eligible = (_MODE in ('all', 'dvalue') or _FORCE_INTERPRET) \
        and (c % 32 == 0) and (_on_tpu() or _FORCE_INTERPRET) \
        and sum(gh * gw for gh, gw in query_grids) == l
    tables = _visit_tables(bh, h, w, query_grids, p, CH, RNG,
                           MARGIN_ROWS) if eligible else None

    def xla_dpatch(_, quantize=False):
        # quantize=True mirrors the Pallas path's precision exactly
        # (g -> bf16, w4 -> bf16, then w4*g -> bf16, f32 accumulation)
        # so the two lax.cond branches agree numerically — a single
        # out-of-window offset must not shift gradients for the whole
        # call
        g_u = g_f.astype(jnp.bfloat16).astype(jnp.float32) \
            if quantize else g_f
        w4_u = w4.astype(jnp.bfloat16).astype(jnp.float32) \
            if quantize else w4.astype(jnp.float32)
        u = (w4_u.reshape(bh, l, p, 4)[..., None]
             * g_u[:, :, None, None, :]).reshape(bh * s, 4 * c)
        if quantize:
            u = u.astype(jnp.bfloat16).astype(jnp.float32)
        return jnp.zeros((bh * (h + 1) * (w + 1), 4 * c), jnp.float32
                         ).at[idx].add(u).reshape(
            bh, (h + 1) * (w + 1), 4 * c)

    if tables is None:
        d_patch = xla_dpatch(None)
    else:
        idx_flat = idxp.reshape(1, bh * s)
        lo = jnp.asarray(tables['lo'])
        hi = jnp.asarray(tables['hi'])
        in_window = jnp.all((idx_flat[0] >= lo) & (idx_flat[0] < hi))

        def fast(_):
            # update rows u = w4 (x) g, PRECOMPUTED in XLA so the
            # kernel is one one-hot matmul per visit. Precision mirrors
            # xla_dpatch(quantize=True) exactly (g -> bf16, w4 -> bf16,
            # w4*g single-rounded to bf16 — the lane-tiling matmuls
            # below only copy values, never combine them, so emitting
            # them in bf16 is bit-identical to f32-dot-then-round while
            # skipping two f32 (N, 4c) materializations, ~700 MB of HBM
            # traffic per (level, layer) at LSJ shapes). Built directly
            # in the (N, 4c)-lane layout: the earlier (bh, l, p, 4, c)
            # form paid a physical tile relayout on the final reshape
            # (~1.7 ms per (level, layer), profiled).
            w4t = jnp.dot(w4.reshape(bh * s, 4).astype(jnp.bfloat16),
                          jnp.asarray(_corner_expand_mat(c)).astype(
                              jnp.bfloat16),
                          preferred_element_type=jnp.bfloat16)
            g_t = jnp.dot(jnp.repeat(
                g_f.astype(jnp.bfloat16).reshape(bh * l, c), p, axis=0),
                jnp.asarray(_corner_fold_mat(c).T).astype(jnp.bfloat16),
                preferred_element_type=jnp.bfloat16)
            u_flat = (w4t.astype(jnp.float32)
                      * g_t.astype(jnp.float32)).astype(jnp.bfloat16)
            return _dpatch_pallas(idx_flat, u_flat, tables, bh, c)

        d_patch = jax.lax.cond(
            in_window, fast, lambda _: xla_dpatch(None, quantize=True),
            None)

    # d_value[y, x] collects its four patch appearances — pure slices
    # of d_patch, no pad/update-slice chain (which lowered to 11.6
    # ms/step of dynamic-update-slice copies)
    dp = d_patch.reshape(bh, h + 1, w + 1, 4, c)
    d_value = (dp[:, 1:, 1:, 0] + dp[:, 1:, :-1, 1]
               + dp[:, :-1, 1:, 2] + dp[:, :-1, :-1, 3]
               ).astype(value.dtype)
    return (d_value, d_loc_x, d_loc_y, d_weight)


_msda_sample_psum.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------
# P-MAJOR flat-sample entry
#
# Sample order n = bhi*(P*L) + pp*L + qq (point-major). The caller
# (models/utils/transformer.py MultiScaleDeformableAttention) produces
# loc_x/loc_y/weight DIRECTLY in this layout from the transposed
# offset/attention projections — p-major is the one flattening a
# (b, l, h, p, 2)-free producer can emit without interleaving the
# 4-point axis into lanes. Benefits over the (query, point) order:
#   * no (BH, L, P)/(..., 2)-minormost intermediates anywhere (a 4- or
#     2-lane minormost axis pads to 128 lanes physically — ~25 ms/step
#     of 'data formatting' at Box2Mask LSJ shapes, profiled);
#   * per-sample grads g broadcast to samples by a FREE leading-axis
#     broadcast (p-minor needed a sublane `jnp.repeat`);
#   * the point-sum is a leading-axis reduce, not a (s//p, p) split.
# The d(patch) one-hot kernel is order-agnostic; only its static visit
# schedule changes (runs per (point, section) instead of per section).
# --------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _visit_tables_pm(bh: int, h: int, w: int,
                     query_grids: Tuple[Tuple[int, int], ...], p: int,
                     ch: int, rng_: int, marg_rows: int):
    """d(patch) visit schedule for the P-MAJOR sample order.

    Eligible when ``ch`` divides every query-section size (chunk
    windows then never cross a (point, section) run boundary: every
    run start bhi*L*P + pp*L + a_off[a] is a multiple of ch)."""
    ph, pw = h + 1, w + 1
    cells = ph * pw
    sizes = [gh * gw for gh, gw in query_grids]
    if any(sz % ch for sz in sizes):
        return None
    l_tot = sum(sizes)
    n = bh * l_tot * p
    rng_ = min(rng_, -(-cells // 128) * 128)
    marg = marg_rows * pw
    nr = -(-cells // rng_)

    bases = []
    for (gh, gw) in query_grids:
        qy, qx = np.mgrid[0:gh, 0:gw]
        ry = ((qy + 0.5) / gh).astype(np.float32) * np.float32(h) \
            - np.float32(0.5)
        rx = ((qx + 0.5) / gw).astype(np.float32) * np.float32(w) \
            - np.float32(0.5)
        py = np.floor(ry).astype(np.int64) + 1
        px = np.floor(rx).astype(np.int64) + 1
        bases.append((py * pw + px).reshape(-1))
    a_off = np.cumsum([0] + sizes)

    vk, vs, vbase, vzero = [], [], [], []
    lo_s = np.full(n, 2**30, np.int64)
    hi_s = np.full(n, -1, np.int64)
    nk = bh * nr
    for bhi in range(bh):
        for r in range(nr):
            k = bhi * nr + r
            first = True
            for pp in range(p):
                for a, bq in enumerate(bases):
                    sel = np.nonzero((bq >= r * rng_ - marg) &
                                     (bq < (r + 1) * rng_ + marg))[0]
                    if sel.size == 0:
                        continue
                    run0 = bhi * l_tot * p + pp * l_tot + a_off[a]
                    s0 = max(((run0 + sel[0]) // ch) * ch, run0)
                    s1 = run0 + sel[-1] + 1
                    nchunks = -(-(s1 - s0) // ch)
                    assert s0 + nchunks * ch <= run0 + sizes[a]
                    for j in range(nchunks):
                        vk.append(k)
                        vs.append(s0 // ch + j)
                        vbase.append(r * rng_)
                        vzero.append(1 if first else 0)
                        first = False
                    send = s0 + nchunks * ch
                    lo_s[s0:send] = np.minimum(lo_s[s0:send], r * rng_)
                    hi_s[s0:send] = np.maximum(hi_s[s0:send],
                                               (r + 1) * rng_)
            if first:
                vk.append(k); vs.append(0)
                vbase.append(-2**20); vzero.append(1)
    return dict(
        vk=np.asarray(vk, np.int32), vs=np.asarray(vs, np.int32),
        vbase=np.asarray(vbase, np.int32),
        vzero=np.asarray(vzero, np.int32),
        lo=lo_s.astype(np.int32), hi=hi_s.astype(np.int32),
        nr=nr, rng=rng_, nk=nk, cells=cells)


def _sample_flat_pm(value, loc_x, loc_y, weight, p):
    """XLA forward for p-major flat samples: relayout-free tail + a
    leading-axis point sum. Same product contract as _sample_psum_ref's
    tail (bf16 products when value is bf16)."""
    b = value.shape[0]
    c = value.shape[-1]
    flat, idx_local, base_bh, (wx, wy, ok) = _corner_geom(
        value, loc_x, loc_y)
    s = idx_local.shape[1]
    rows = _take_rows_grouped(flat, idx_local, base_bh, b, s, 4 * c)
    w4 = _corner_w4(wx, wy, ok, weight)
    w4t = jnp.dot(w4.reshape(b * s, 4).astype(rows.dtype),
                  jnp.asarray(_corner_expand_mat(c)).astype(rows.dtype),
                  preferred_element_type=rows.dtype)        # (N, 4c)
    prod = rows * w4t
    out = jnp.dot(prod, jnp.asarray(_corner_fold_mat(c)).astype(
        prod.dtype), preferred_element_type=jnp.float32)    # (N, c) f32
    return out.reshape(b, p, s // p, c).sum(axis=1).astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _msda_sample_psum_pm(value, loc_x, loc_y, weight, query_grids, p):
    return _sample_flat_pm(value, loc_x, loc_y, weight, p)


def _pm_fwd(value, loc_x, loc_y, weight, query_grids, p):
    out = _msda_sample_psum_pm(value, loc_x, loc_y, weight,
                               query_grids, p)
    return out, (value, loc_x, loc_y, weight)


def _pm_bwd(query_grids, p, res, g):
    value, loc_x, loc_y, weight = res
    bh, h, w, c = value.shape
    s = loc_x.shape[1]
    l = s // p
    idxp, w4, (wx, wy, ok) = _geom2(value.shape, loc_x, loc_y, weight)
    base_bh = (jnp.arange(bh, dtype=jnp.int32)
               * ((h + 1) * (w + 1)))[:, None]
    idx = (idxp + base_bh).reshape(-1)
    g_f = g.astype(jnp.float32)                          # (bh, l, c)

    # ---- rdot: per-sample <rows_k, g> (XLA; flat lane layout) ----
    patch = bilinear_patch_table(value)
    flatp = patch.reshape(bh * (h + 1) * (w + 1), 4 * c)
    rows = _take_rows_grouped(flatp, idxp, base_bh, bh, s, 4 * c)
    # p-major: per-sample grads are a FREE leading-axis broadcast
    g_samp = jnp.broadcast_to(
        g.astype(rows.dtype)[:, None], (bh, p, l, c)).reshape(
        bh * s, c)                                       # (N, c)
    g_t = jnp.dot(g_samp,
                  jnp.asarray(_corner_fold_mat(c).T).astype(rows.dtype),
                  preferred_element_type=rows.dtype)     # (N, 4c)
    prod = rows * g_t
    rdot = jnp.dot(prod,
                   jnp.asarray(_corner_seg_mat(c)).astype(prod.dtype),
                   preferred_element_type=jnp.float32).reshape(
        bh, s, 4)                                        # (BH, S, 4)

    okf = ok.astype(jnp.float32)
    okw = (okf * weight).astype(jnp.float32)
    cw = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                    wy * (1 - wx), wy * wx], axis=-1)    # (BH, S, 4)
    d_weight = (okf * (cw * rdot).sum(-1)).astype(weight.dtype)
    d_wx = okw * ((1 - wy) * (rdot[..., 1] - rdot[..., 0])
                  + wy * (rdot[..., 3] - rdot[..., 2]))
    d_wy = okw * ((1 - wx) * (rdot[..., 2] - rdot[..., 0])
                  + wx * (rdot[..., 3] - rdot[..., 1]))
    d_loc_x = (d_wx * w).astype(loc_x.dtype)
    d_loc_y = (d_wy * h).astype(loc_y.dtype)

    # ---- d(value) via d(patch) ----
    eligible = (_MODE in ('all', 'dvalue') or _FORCE_INTERPRET) \
        and (c % 32 == 0) and (_on_tpu() or _FORCE_INTERPRET) \
        and sum(gh * gw for gh, gw in query_grids) == l
    # two-tier static window: a TIGHT margin-5 schedule (covers the
    # init offsets, <= npnt+0.5 rows, and typically-trained ones; ~24%
    # fewer kernel visits at level-0 LSJ shapes — measured 259.2 ->
    # 254.2 ms/step) nested inside the MARGIN_ROWS one, with the exact
    # XLA scatter as the final fallback
    tables = _visit_tables_pm(bh, h, w, query_grids, p, CH, RNG,
                              MARGIN_ROWS) if eligible else None
    tables_tight = _visit_tables_pm(
        bh, h, w, query_grids, p, CH, RNG, 5) \
        if eligible and MARGIN_ROWS > 5 else None

    def xla_dpatch(_, quantize=False):
        # exactness twin of the kernel path: g -> bf16, w4 -> bf16,
        # w4*g single-rounded to bf16, f32 scatter accumulation
        g_u = g_f.astype(jnp.bfloat16).astype(jnp.float32) \
            if quantize else g_f
        w4_u = w4.astype(jnp.bfloat16).astype(jnp.float32) \
            if quantize else w4.astype(jnp.float32)
        g_us = jnp.broadcast_to(g_u[:, None], (bh, p, l, c)).reshape(
            bh, s, c)
        u = (w4_u[..., None] * g_us[:, :, None, :]).reshape(
            bh * s, 4 * c)
        if quantize:
            u = u.astype(jnp.bfloat16).astype(jnp.float32)
        return jnp.zeros((bh * (h + 1) * (w + 1), 4 * c), jnp.float32
                         ).at[idx].add(u).reshape(
            bh, (h + 1) * (w + 1), 4 * c)

    if tables is None:
        d_patch = xla_dpatch(None)
    else:
        idx_flat = idxp.reshape(1, bh * s)

        def _u_flat():
            # same bf16 update-row contract as the p-minor fast path
            w4t = jnp.dot(w4.reshape(bh * s, 4).astype(jnp.bfloat16),
                          jnp.asarray(_corner_expand_mat(c)).astype(
                              jnp.bfloat16),
                          preferred_element_type=jnp.bfloat16)
            g_tb = jnp.dot(g_samp.astype(jnp.bfloat16),
                           jnp.asarray(_corner_fold_mat(c).T).astype(
                               jnp.bfloat16),
                           preferred_element_type=jnp.bfloat16)
            return (w4t.astype(jnp.float32)
                    * g_tb.astype(jnp.float32)).astype(jnp.bfloat16)

        def _in(t):
            return jnp.all((idx_flat[0] >= jnp.asarray(t['lo']))
                           & (idx_flat[0] < jnp.asarray(t['hi'])))

        def _fast(t):
            return lambda _: _dpatch_pallas(idx_flat, _u_flat(), t,
                                            bh, c)

        def _wide(_):
            return jax.lax.cond(
                _in(tables), _fast(tables),
                lambda __: xla_dpatch(None, quantize=True), None)

        if tables_tight is not None:
            d_patch = jax.lax.cond(
                _in(tables_tight), _fast(tables_tight), _wide, None)
        else:
            d_patch = _wide(None)

    dp = d_patch.reshape(bh, h + 1, w + 1, 4, c)
    d_value = (dp[:, 1:, 1:, 0] + dp[:, 1:, :-1, 1]
               + dp[:, :-1, 1:, 2] + dp[:, :-1, :-1, 3]
               ).astype(value.dtype)
    return (d_value, d_loc_x, d_loc_y, d_weight)


_msda_sample_psum_pm.defvjp(_pm_fwd, _pm_bwd)


def msda_sample_psum_pm(value, loc_x, loc_y, weight, query_grids,
                        num_points: int):
    """Deformable-attention sampling, P-MAJOR flat sample layout.

    value: (BH, H, W, c) one target level, one head's channels;
    loc_x/loc_y/weight: (BH, P*L) f32 with sample n = pp*L + qq;
    query_grids: static (h, w) per query section (sum h*w = L).
    Returns (BH, L, c) = sum_p weight * bilinear_sample(value, loc).
    """
    return _msda_sample_psum_pm(value, loc_x, loc_y, weight,
                                tuple(tuple(g) for g in query_grids),
                                num_points)
