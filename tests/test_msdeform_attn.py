"""MultiScaleDeformableAttention vs an explicit per-head/-level/-point
numpy oracle.

The module folds heads into the batch axis and weights samples with one
einsum (models/utils/transformer.py:153-170); this test pins the exact
mmcv semantics (reference consumer: mmdet/models/utils/transformer.py:23,
msdeformattn_pixel_decoder.py:161) with a literal loop implementation
reading the same initialized parameters.
"""
import numpy as np

import jax
import jax.numpy as jnp

from boxinstseg_tpu.models.utils.transformer import (
    MultiScaleDeformableAttention)


def _np_dense(x, kernel, bias):
    return x @ np.asarray(kernel) + np.asarray(bias)


def _np_grid_sample(value, lx, ly):
    """value (H, W, D); lx/ly (N,) normalized [0,1]; align_corners=False,
    zero padding. Returns (N, D)."""
    h, w, d = value.shape
    x = lx * w - 0.5
    y = ly * h - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    out = np.zeros((len(lx), d), np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            xi, yi = x0 + dx, y0 + dy
            wgt = (1 - np.abs(x - xi)) * (1 - np.abs(y - yi))
            inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            v = value[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]
            out += (wgt * inb)[:, None] * v
    return out


def test_msdeform_attn_matches_loop_oracle():
    C, H, NL, NP = 16, 4, 2, 3
    spatial = [(6, 9), (3, 5)]
    S = sum(hh * ww for hh, ww in spatial)
    B, L = 2, 7
    rng = np.random.default_rng(3)
    q = rng.standard_normal((B, L, C)).astype(np.float32)
    v_in = rng.standard_normal((B, S, C)).astype(np.float32)
    ref = rng.random((B, L, 2)).astype(np.float32)

    mod = MultiScaleDeformableAttention(
        embed_dims=C, num_heads=H, num_levels=NL, num_points=NP)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(q),
                         jnp.asarray(v_in), spatial, jnp.asarray(ref))
    got = np.asarray(mod.apply(variables, jnp.asarray(q), jnp.asarray(v_in),
                               spatial, jnp.asarray(ref)))

    # perturb the zero-initialized offset/attn kernels so the test
    # exercises query-dependent offsets and non-uniform weights
    p = jax.tree_util.tree_map(np.asarray, variables['params'])
    p['sampling_offsets']['kernel'] = rng.standard_normal(
        (C, H * NL * NP * 2)).astype(np.float32) * 0.3
    p['attention_weights']['kernel'] = rng.standard_normal(
        (C, H * NL * NP)).astype(np.float32) * 0.5
    variables = {'params': jax.tree_util.tree_map(jnp.asarray, p)}
    got = np.asarray(mod.apply(variables, jnp.asarray(q), jnp.asarray(v_in),
                               spatial, jnp.asarray(ref)))

    # ---- numpy oracle: literal loops over (b, head, level, point)
    d = C // H
    v = _np_dense(v_in.astype(np.float64), p['value_proj']['kernel'],
                  p['value_proj']['bias'])
    off = _np_dense(q.astype(np.float64), p['sampling_offsets']['kernel'],
                    p['sampling_offsets']['bias'])
    off = off.reshape(B, L, H, NL, NP, 2)
    aw = _np_dense(q.astype(np.float64), p['attention_weights']['kernel'],
                   p['attention_weights']['bias'])
    aw = aw.reshape(B, L, H, NL * NP)
    aw = np.exp(aw - aw.max(-1, keepdims=True))
    aw = (aw / aw.sum(-1, keepdims=True)).reshape(B, L, H, NL, NP)

    starts = np.cumsum([0] + [hh * ww for hh, ww in spatial])
    want = np.zeros((B, L, H, d))
    for b in range(B):
        for lvl, (hh, ww) in enumerate(spatial):
            vl = v[b, starts[lvl]:starts[lvl + 1]].reshape(hh, ww, H, d)
            for hd in range(H):
                for pt in range(NP):
                    loc = ref[b] + off[b, :, hd, lvl, pt] / np.array(
                        [ww, hh])
                    smp = _np_grid_sample(vl[:, :, hd], loc[:, 0],
                                          loc[:, 1])
                    want[b, :, hd] += aw[b, :, hd, lvl, pt, None] * smp
    want = _np_dense(want.reshape(B, L, C), p['output_proj']['kernel'],
                     p['output_proj']['bias'])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
