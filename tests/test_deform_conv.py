"""DeformConv2d (DCNv1/v2) vs a direct numpy loop oracle.

The reference routes ``use_dcn_in_tower``/``type_dcn`` into mmcv's CUDA
deform conv (reference: mmdet/models/dense_heads/box_solov2_head.py:68-69);
semantics here follow torchvision.ops.deform_conv2d / mmcv: offset
channels [dy_0, dx_0, dy_1, dx_1, ...] in row-major tap order, DCNv2
applies a per-tap sigmoid mask, out-of-bounds samples read zero.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from boxinstseg_tpu.models.deform_conv import DeformConv2d
from boxinstseg_tpu.registry import build_detector


def oracle_deform_conv(x, weight, bias, offset, mask, stride=1, padding=1,
                       dilation=1):
    """Direct per-pixel loop deform conv. x: (B, H, W, Cin) NHWC;
    weight: (kh, kw, Cin, Cout); offset: (B, OH, OW, 2K) [dy, dx] pairs;
    mask: (B, OH, OW, K) or None."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    oh = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    ow = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    def sample(img, py, px):
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        wy, wx = py - y0, px - x0
        out = np.zeros(cin, np.float64)
        for (yy, xx, ww) in [(y0, x0, (1 - wy) * (1 - wx)),
                             (y0, x0 + 1, (1 - wy) * wx),
                             (y0 + 1, x0, wy * (1 - wx)),
                             (y0 + 1, x0 + 1, wy * wx)]:
            if 0 <= yy < h and 0 <= xx < w:
                out += ww * img[yy, xx]
        return out

    out = np.zeros((b, oh, ow, cout), np.float64)
    for bi in range(b):
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(cout, np.float64)
                for a in range(kh):
                    for c in range(kw):
                        k = a * kw + c
                        dy = offset[bi, i, j, 2 * k]
                        dx = offset[bi, i, j, 2 * k + 1]
                        py = i * stride - padding + a * dilation + dy
                        px = j * stride - padding + c * dilation + dx
                        v = sample(x[bi], py, px)
                        if mask is not None:
                            v = v * mask[bi, i, j, k]
                        acc += v @ weight[a, c]
                out[bi, i, j] = acc
    if bias is not None:
        out += bias
    return out


@pytest.mark.parametrize('modulated', [False, True])
def test_deform_conv_matches_loop_oracle(modulated):
    rng = np.random.RandomState(0 if modulated else 1)
    b, h, w, cin, cout = 2, 7, 6, 5, 4
    x = rng.randn(b, h, w, cin).astype(np.float32)

    mod = DeformConv2d(cout, 3, 1, 1, 1, modulated=modulated)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(lambda a: np.asarray(a),
                                    variables['params'])
    # randomize the (zero-init) offset branch so offsets/masks vary
    # per pixel; keep them smallish so samples stay near the grid
    k = 9
    off_ch = (3 if modulated else 2) * k
    params['conv_offset']['kernel'] = (
        rng.randn(3, 3, cin, off_ch).astype(np.float32) * 0.1)
    params['conv_offset']['bias'] = (
        rng.randn(off_ch).astype(np.float32) * 0.3)
    variables = {'params': jax.tree_util.tree_map(jnp.asarray, params)}

    out = mod.apply(variables, jnp.asarray(x))

    # oracle: recompute the offset branch with numpy (plain conv)
    import jax.lax as lax
    off = np.asarray(lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(params['conv_offset']['kernel']),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')))
    off = off + params['conv_offset']['bias']
    if modulated:
        offs = np.zeros(off[..., :2 * k].shape, np.float32)
        offs[..., 0::2] = off[..., 0:2 * k:2]
        offs[..., 1::2] = off[..., 1:2 * k:2]
        msk = 1.0 / (1.0 + np.exp(-off[..., 2 * k:]))
    else:
        offs = off[..., :2 * k].copy()
        msk = None
    ref = oracle_deform_conv(x.astype(np.float64),
                             params['kernel'].astype(np.float64),
                             params['bias'].astype(np.float64),
                             offs.astype(np.float64), msk)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_zero_offsets_equal_plain_conv():
    """At init (zero offset branch) DCN must equal the regular conv."""
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 9, 6).astype(np.float32)
    mod = DeformConv2d(7, 3, 1, 1, 1, modulated=True)
    variables = mod.init(jax.random.PRNGKey(3), jnp.asarray(x))
    out = mod.apply(variables, jnp.asarray(x))

    import jax.lax as lax
    kernel = variables['params']['kernel']
    bias = variables['params']['bias']
    # DCNv2 at zero-init has mask = sigmoid(0) = 0.5 per tap
    ref = lax.conv_general_dilated(
        jnp.asarray(x), kernel * 0.5, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    mod1 = DeformConv2d(7, 3, 1, 1, 1, modulated=False)
    v1 = mod1.init(jax.random.PRNGKey(3), jnp.asarray(x))
    out1 = mod1.apply(v1, jnp.asarray(x))
    ref1 = lax.conv_general_dilated(
        jnp.asarray(x), v1['params']['kernel'], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + v1['params']['bias']
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               rtol=1e-5, atol=1e-5)


def test_dcn_in_tower_builds_and_runs():
    """use_dcn_in_tower=True is no longer silently ignored: the towers
    carry conv_offset parameters and the loss path runs."""
    from test_boxlevelset_model import tiny_cfg, synth_batch
    cfg = tiny_cfg()
    cfg['bbox_head']['use_dcn_in_tower'] = True
    cfg['bbox_head']['type_dcn'] = 'DCNv2'
    model = build_detector(cfg)
    batch = synth_batch(np.random.RandomState(0), b=1)
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           jnp.zeros((), jnp.int32), method=model.loss)
    flat = jax.tree_util.tree_leaves_with_path(variables['params'])
    names = ['/'.join(str(p) for p in path) for path, _ in flat]
    assert any('conv_offset' in n for n in names), names[:20]
    losses = model.apply(variables, batch, jnp.zeros((), jnp.int32),
                         method=model.loss)
    assert all(np.isfinite(float(v)) for k, v in losses.items()
               if 'loss' in k)
