"""Fused (flash-style) Swin window attention for TPU.

The XLA formulation of window attention (backbones/swin.py fallback
path) materializes the (num_windows*B, heads, N, N) logit tensor in HBM
three times per block (logits, +bias/mask, softmax) — at Swin-L LSJ
shapes that is 71-241 MB per tensor per block, and the profiled cost of
the bias add alone was 16 ms/step (docs/tpu_performance_notes.md). This
kernel keeps the whole chain

    logits = q k^T * scale + rel_pos_bias[h] + shift_mask[w]
    attn   = softmax(logits);  out = attn v

in VMEM per window grid step (heads unrolled in-kernel): HBM sees only
the (N, C) q/k/v/out token tiles (the tokens' own bytes, once), the
(H, N, N) bias (a revisited block, fetched once per call), and a (N,)
int32 region row per window — the shifted-window mask is NOT an
(nW, N, N) additive tensor but the per-token REGION IDS of the standard
9-region Swin partition, compared in-kernel (mask[i,j] = -100 iff
region[i] != region[j]; reference mmdet/models/backbones/swin.py:242
builds the same additive mask from the same cyclic-shift region image).

The backward recomputes attn in-kernel (flash-attention style) and
emits dq/dk/dv tiles plus the relative-position-bias gradient
accumulated across windows into a revisited (H, N, N) output block.

Layout contract: q/k/v/out are (BW, N, C) with C = H*D — the DIRECT
lane slices of the fused qkv Dense output, so neither the caller nor
the kernel ever transposes the head axis; heads are STATIC in-kernel
lane slices [h*D, (h+1)*D) of the C lanes (a first revision used
(BW, N, H, D) tiles — the D=32 lane dim padded every VMEM tile 4x and
the head-unrolled backward overflowed the 16 MB scoped VMEM at Swin-L
stage-2 shapes).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


_FORCE_INTERPRET = False       # tests flip this to run the kernel on CPU

_NEG = -100.0                  # same additive constant as the XLA mask


@functools.lru_cache(maxsize=None)
def shift_regions(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """(nW, 1, N) int32 region ids of the cyclically shifted 9-region
    partition, window-partitioned exactly like the tokens. shift == 0
    gives all-zero rows (no mask). The middle singleton keeps the
    Pallas block's last-two dims equal to the array's."""
    img = np.zeros((hp, wp), np.int32)
    if shift > 0:
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for wsl in (slice(0, -ws), slice(-ws, -shift),
                        slice(-shift, None)):
                img[hs, wsl] = cnt
                cnt += 1
    r = img.reshape(hp // ws, ws, wp // ws, ws)
    return r.transpose(0, 2, 1, 3).reshape(-1, 1, ws * ws)


def _head_attn(q, k, bias_h, maskadd, scale, hi, d):
    """Per-head softmax(q k^T * scale + bias + mask). The qk dot runs
    on the NATIVE (bf16) operands with f32 accumulation — casting the
    tiles to f32 first made every MXU matmul a f32 matmul (~4-8x the
    bf16 issue rate); softmax stays f32."""
    qh = q[:, hi * d:(hi + 1) * d]
    kh = k[:, hi * d:(hi + 1) * d]
    logits = jax.lax.dot_general(
        qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + bias_h + maskadd
    m = logits.max(axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    return p / p.sum(axis=1, keepdims=True)


def _pick_hc(h: int, d: int) -> int:
    """Heads per grid step: lane-blocked head chunks need hc*d % 128
    == 0; the full head count is always legal (block lane dim == array
    lane dim). Caps the per-step VMEM footprint (h=48 with per-head
    f32 intermediates overflowed the 16 MB scoped VMEM)."""
    for hc in range(min(h, 12), 0, -1):
        if h % hc == 0 and (hc == h or (hc * d) % 128 == 0):
            return hc
    return h


def _fwd_kernel_factory(n, h, d, scale, out_dtype):
    def kernel(q_ref, k_ref, v_ref, bias_ref, reg_ref, out_ref):
        q = q_ref[0]                                     # (n, c) native
        k = k_ref[0]
        v = v_ref[0]
        reg = reg_ref[0]                                 # (1, n)
        maskadd = jnp.where(reg[0][:, None] != reg[0][None, :],
                            _NEG, 0.0)
        outs = []
        for hi in range(h):
            attn = _head_attn(q, k, bias_ref[hi].astype(jnp.float32),
                              maskadd, scale, hi, d)
            # probs in the input dtype for a native-rate MXU matmul
            # (standard flash-attention practice; exact when f32)
            outs.append(jax.lax.dot_general(
                attn.astype(q.dtype), v[:, hi * d:(hi + 1) * d],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        out_ref[0] = jnp.concatenate(outs, axis=1).astype(out_dtype)

    return kernel


def _bwd_kernel_factory(n, h, d, scale, in_dtype):
    from jax.experimental import pallas as pl

    def kernel(q_ref, k_ref, v_ref, bias_ref, reg_ref, g_ref,
               dq_ref, dk_ref, dv_ref, dbias_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            dbias_ref[...] = jnp.zeros_like(dbias_ref[...])

        q = q_ref[0]                                     # native dtype
        k = k_ref[0]
        v = v_ref[0]
        g = g_ref[0]
        reg = reg_ref[0]
        maskadd = jnp.where(reg[0][:, None] != reg[0][None, :],
                            _NEG, 0.0)
        dqs, dks, dvs, dbs = [], [], [], []
        for hi in range(h):
            attn = _head_attn(q, k, bias_ref[hi].astype(jnp.float32),
                              maskadd, scale, hi, d)
            gh = g[:, hi * d:(hi + 1) * d]
            vh = v[:, hi * d:(hi + 1) * d]
            attn_n = attn.astype(q.dtype)   # native-rate MXU operands
            dvs.append(jax.lax.dot_general(
                attn_n, gh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dp = jax.lax.dot_general(
                gh, vh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (n, n)
            ds = attn * (dp - (dp * attn).sum(axis=1, keepdims=True))
            dbs.append(ds)
            ds_n = ds.astype(q.dtype)
            dqs.append(jax.lax.dot_general(
                ds_n, k[:, hi * d:(hi + 1) * d],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
            dks.append(jax.lax.dot_general(
                ds_n, q[:, hi * d:(hi + 1) * d],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
        dq_ref[0] = jnp.concatenate(dqs, axis=1).astype(in_dtype)
        dk_ref[0] = jnp.concatenate(dks, axis=1).astype(in_dtype)
        dv_ref[0] = jnp.concatenate(dvs, axis=1).astype(in_dtype)
        for hi in range(h):
            dbias_ref[hi] += dbs[hi]

    return kernel


def _specs(n, d, nw, hc):
    from jax.experimental import pallas as pl

    tile = pl.BlockSpec((1, n, hc * d), lambda hci, bi: (bi, 0, hci))
    bias = pl.BlockSpec((hc, n, n), lambda hci, bi: (hci, 0, 0))
    reg = pl.BlockSpec((1, 1, n), lambda hci, bi: (bi % nw, 0, 0))
    return tile, bias, reg


def _flash_fwd(q, k, v, bias_hnn, regions, scale):
    from jax.experimental import pallas as pl

    bw, n, c = q.shape
    h = bias_hnn.shape[0]
    d = c // h
    hc = _pick_hc(h, d)
    nw = regions.shape[0]
    tile, bias, reg = _specs(n, d, nw, hc)
    kernel = _fwd_kernel_factory(n, hc, d, scale, q.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bw, n, c), q.dtype),
        grid=(h // hc, bw),
        in_specs=[tile, tile, tile, bias, reg],
        out_specs=tile,
        interpret=_FORCE_INTERPRET,
    )(q, k, v, bias_hnn, regions)


def _flash_bwd(q, k, v, bias_hnn, regions, scale, g):
    from jax.experimental import pallas as pl

    bw, n, c = q.shape
    h = bias_hnn.shape[0]
    d = c // h
    hc = _pick_hc(h, d)
    nw = regions.shape[0]
    tile, bias, reg = _specs(n, d, nw, hc)
    kernel = _bwd_kernel_factory(n, hc, d, scale, q.dtype)
    dq, dk, dv, dbias = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((bw, n, c), q.dtype),
            jax.ShapeDtypeStruct((bw, n, c), q.dtype),
            jax.ShapeDtypeStruct((bw, n, c), q.dtype),
            jax.ShapeDtypeStruct((h, n, n), jnp.float32),
        ],
        grid=(h // hc, bw),
        in_specs=[tile, tile, tile, bias, reg, tile],
        out_specs=[tile, tile, tile, bias],
        interpret=_FORCE_INTERPRET,
    )(q, k, v, bias_hnn, regions, g)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def window_attention(q, k, v, bias_hnn, regions, scale):
    """Fused window attention.

    q/k/v: (BW, N, C) head-concat layout; bias_hnn: (H, N, N) f32
    relative-position bias; regions: (nW, 1, N) int32 shift-partition
    ids (zeros = no mask); scale: static float. Returns (BW, N, C) in
    q's dtype.
    """
    return _flash_fwd(q, k, v, bias_hnn, regions, scale)


def _wa_fwd(q, k, v, bias_hnn, regions, scale):
    out = _flash_fwd(q, k, v, bias_hnn, regions, scale)
    return out, (q, k, v, bias_hnn, regions)


def _wa_bwd(scale, res, g):
    q, k, v, bias_hnn, regions = res
    dq, dk, dv, dbias = _flash_bwd(q, k, v, bias_hnn, regions, scale, g)
    return dq, dk, dv, dbias, None


window_attention.defvjp(_wa_fwd, _wa_bwd)


def flash_ok(bw: int, nw: int, n: int, d: int, h: int) -> bool:
    """Gate: TPU backend (or interpret-forced), lane-friendly head_dim,
    whole windows per image, bounded head-unroll. SWIN_FLASH=0
    disables."""
    if os.environ.get('SWIN_FLASH', '1') == '0':
        return False
    if not (_FORCE_INTERPRET or jax.default_backend()
            not in ('cpu', 'gpu')):
        return False
    return (bw % nw == 0 and d % 8 == 0 and n % 8 == 0
            and d <= 128 and h <= 48)
