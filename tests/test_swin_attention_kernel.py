"""Golden tests for the fused Swin window-attention kernel
(ops/swin_attention.py) — interpret mode on CPU vs a plain-jnp
reference of the exact XLA fallback math (backbones/swin.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from boxinstseg_tpu.ops import swin_attention as swa


BW, NW, N, H, D = 8, 4, 16, 2, 8   # 2 images x 4 windows, ws=4


@pytest.fixture(autouse=True)
def _interpret():
    # interpret mode on CPU; on a real TPU backend (BOXINSTSEG_TEST_TPU=1
    # conftest passthrough) the ACTUAL Mosaic kernel runs against the
    # same references — hardware numerics validation
    force = jax.default_backend() in ('cpu', 'gpu')
    swa._FORCE_INTERPRET = force
    yield
    swa._FORCE_INTERPRET = False


def _ref(q, k, v, bias_hnn, regions, scale):
    """(BW, N, C) reference in f32 — same math as the XLA path."""
    qf = q.astype(jnp.float32).reshape(BW, N, H, D)
    kf = k.astype(jnp.float32).reshape(BW, N, H, D)
    vf = v.astype(jnp.float32).reshape(BW, N, H, D)
    logits = jnp.einsum('bnhd,bmhd->bhnm', qf, kf) * scale
    logits = logits + bias_hnn[None]
    r2 = regions[:, 0]                                   # (nW, N)
    mask = jnp.where(r2[:, None, :] != r2[:, :, None], -100.0, 0.0)
    mask_b = jnp.tile(mask, (q.shape[0] // regions.shape[0], 1, 1))
    logits = logits + mask_b[:, None]
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum('bhnm,bmhd->bnhd', attn, vf).reshape(BW, N, H * D)


def _inputs(seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(BW, N, H * D).astype(np.float32), dtype)
    k = jnp.asarray(rng.randn(BW, N, H * D).astype(np.float32), dtype)
    v = jnp.asarray(rng.randn(BW, N, H * D).astype(np.float32), dtype)
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32))
    regions = jnp.asarray(
        rng.randint(0, 3, (NW, 1, N)).astype(np.int32))
    return q, k, v, bias, regions


def test_forward_matches_reference():
    q, k, v, bias, regions = _inputs()
    out = swa.window_attention(q, k, v, bias, regions, 0.3)
    want = _ref(q, k, v, bias, regions, 0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_no_shift_regions_zero():
    q, k, v, bias, _ = _inputs(1)
    regions = jnp.zeros((NW, 1, N), jnp.int32)
    out = swa.window_attention(q, k, v, bias, regions, 0.25)
    want = _ref(q, k, v, bias, regions, 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_reference():
    q, k, v, bias, regions = _inputs(2)
    g_tan = jnp.asarray(
        np.random.RandomState(9).randn(BW, N, H * D).astype(np.float32))

    def loss_kernel(q, k, v, bias):
        out = swa.window_attention(q, k, v, bias, regions, 0.3)
        return (out * g_tan).sum()

    def loss_ref(q, k, v, bias):
        return (_ref(q, k, v, bias, regions, 0.3) * g_tan).sum()

    got = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    # interpret mode is exact f32 math -> tight; on a real TPU the
    # Mosaic dots and the XLA einsums decompose f32 matmuls through
    # DIFFERENT bf16-pass schedules, and the softmax-backward
    # subtraction amplifies the few-ULP gap (measured max 7e-3 on O(1)
    # grads) — compare loosely there (the forward still matches the
    # on-device XLA fallback at 2e-5, see the module test)
    tol = 3e-4 if swa._FORCE_INTERPRET else 2e-2
    for gg, ww, name in zip(got, want, 'qkvb'):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                   rtol=tol, atol=tol, err_msg=name)


def test_module_flash_matches_fallback(monkeypatch):
    """WindowAttention with the kernel forced on (interpret) must match
    its own XLA fallback, shifted and unshifted."""
    from boxinstseg_tpu.models.backbones.swin import WindowAttention
    from boxinstseg_tpu.ops.swin_attention import shift_regions

    hp = wp = 8
    ws = 4
    dim, heads = 16, 2
    nw = (hp // ws) ** 2
    n = ws * ws
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(nw, n, dim).astype(np.float32))
    mod = WindowAttention(dim, heads, ws)
    for shift in (0, 2):
        regions = shift_regions(hp, wp, ws, shift)
        params = mod.init(jax.random.PRNGKey(0), x, regions)
        monkeypatch.setenv('SWIN_FLASH', '0')
        want = mod.apply(params, x, regions)
        monkeypatch.setenv('SWIN_FLASH', '1')
        got = mod.apply(params, x, regions)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f'shift={shift}')


def test_swin_backbone_flash_matches_fallback(monkeypatch):
    """Whole SwinTransformer forward: kernel on (interpret) vs off."""
    from boxinstseg_tpu.registry import build_backbone

    cfg = dict(type='SwinTransformer', embed_dims=32, depths=(2, 2),
               num_heads=(2, 4), window_size=4, out_indices=(0, 1))
    x = jnp.asarray(np.random.RandomState(5).randn(
        1, 32, 32, 3).astype(np.float32))
    bb = build_backbone(dict(cfg))
    params = bb.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv('SWIN_FLASH', '0')
    want = bb.apply(params, x)
    monkeypatch.setenv('SWIN_FLASH', '1')
    got = bb.apply(params, x)
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                   rtol=5e-5, atol=5e-5)
