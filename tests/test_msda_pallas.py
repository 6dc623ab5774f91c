"""msda_sample_psum: custom-VJP (Pallas d(value) kernel) vs pure-XLA
autodiff oracle.

The kernel runs in interpreter mode on the CPU test mesh; the fast
(windowed) path and the out-of-window `lax.cond` fallback are both
checked against plain autodiff through the XLA formulation
(reference op: mmcv ms_deform_attn, mmdet/models/utils/transformer.py:23).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boxinstseg_tpu.ops import msda_pallas as mp

GRIDS = ((4, 4), (8, 8))          # C5-first order like the decoder
P = 4
D = 32
BH = 4
H = W = 8                          # target level grid


@pytest.fixture
def small_kernel_params(monkeypatch):
    monkeypatch.setattr(mp, 'CH', 8)
    monkeypatch.setattr(mp, 'RNG', 32)
    monkeypatch.setattr(mp, 'MARGIN_ROWS', 2)
    monkeypatch.setattr(mp, '_FORCE_INTERPRET', True)
    mp._visit_tables.cache_clear()
    mp._fwd_visit_tables.cache_clear()
    yield
    mp._visit_tables.cache_clear()
    mp._fwd_visit_tables.cache_clear()


def _inputs(rng, offset_scale):
    l = sum(g[0] * g[1] for g in GRIDS)
    value = jnp.asarray(rng.randn(BH, H, W, D).astype(np.float32))
    refs = []
    for (gh, gw) in GRIDS:
        ys = (np.arange(gh) + 0.5) / gh
        xs = (np.arange(gw) + 0.5) / gw
        ref = np.stack(np.meshgrid(xs, ys), axis=-1).reshape(-1, 2)
        refs.append(ref)
    ref = np.concatenate(refs)[None].repeat(BH, 0)      # (BH, L, 2)
    off = rng.randn(BH, l, P, 2).astype(np.float32) * offset_scale
    loc = ref[:, :, None, :] + off / np.asarray([W, H], np.float32)
    weight = jnp.asarray(rng.rand(BH, l, P).astype(np.float32))
    return value, jnp.asarray(loc[..., 0].astype(np.float32)), \
        jnp.asarray(loc[..., 1].astype(np.float32)), weight


def _oracle(value, lx, ly, wt):
    b, l, p = lx.shape
    return mp._sample_psum_ref(value, lx.reshape(b, l * p),
                               ly.reshape(b, l * p),
                               wt.reshape(b, l * p), p)


def _check(offset_scale, rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    value, lx, ly, wt = _inputs(rng, offset_scale)
    cot = jnp.asarray(rng.randn(*_oracle(value, lx, ly, wt).shape)
                      .astype(np.float32))

    def loss_custom(v, x, y, w):
        return (mp.msda_sample_psum(v, x, y, w, GRIDS) * cot).sum()

    def loss_ref(v, x, y, w):
        return (_oracle(v, x, y, w) * cot).sum()

    out_c = mp.msda_sample_psum(value, lx, ly, wt, GRIDS)
    out_r = _oracle(value, lx, ly, wt)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(value, lx, ly, wt)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(value, lx, ly, wt)
    for a, b, name in zip(g_c, g_r, ['value', 'loc_x', 'loc_y', 'w']):
        # d(value) goes through the bf16 one-hot matmul on the fast
        # path; the current production scatter is also bf16, so the
        # tolerance is the bf16 quantization of individual updates
        atol = 2e-2 if name == 'value' else 2e-3
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=atol,
            err_msg=f'grad mismatch: {name} (offset={offset_scale})')


def test_fast_path_grads(small_kernel_params):
    """Offsets within the window -> Pallas (interpret) branch."""
    tables = mp._visit_tables(BH, H, W, GRIDS, P, mp.CH, mp.RNG,
                              mp.MARGIN_ROWS)
    assert tables is not None
    _check(offset_scale=0.8)


def test_fallback_path_grads(small_kernel_params):
    """Huge offsets -> in_window False -> XLA scatter branch of the
    cond; gradients must be identical still."""
    _check(offset_scale=20.0)


def test_cpu_path_matches(monkeypatch):
    """Default CPU configuration (no Pallas) uses the hand-derived VJP
    with the XLA scatter — must match autodiff too."""
    mp._visit_tables.cache_clear()
    _check(offset_scale=1.5)


def test_fwd_visit_tables_and_window(small_kernel_params):
    """The forward/rdot schedule must be eligible at the test shapes,
    cover every sample's chunk with a window, and keep small offsets
    inside it (so the Pallas branch — not the fallback — is what
    test_fast_path_grads exercises)."""
    t = mp._fwd_visit_tables(BH, H, W, GRIDS, P, mp.CH, mp.RNG,
                             mp.MARGIN_ROWS)
    assert t is not None
    assert (t['hi'] > t['lo']).all()
    # one zero-flag per chunk, chunk-ordered schedule
    assert t['vz'].sum() == t['nchunks']
    assert (np.diff(t['vs']) >= 0).all()
    rng = np.random.RandomState(0)
    value, lx, ly, wt = _inputs(rng, 0.5)
    b, l, p = lx.shape
    idx2, _, _ = mp._geom2(value.shape, lx.reshape(b, l * p),
                           ly.reshape(b, l * p), wt.reshape(b, l * p))
    flat = np.asarray(idx2).reshape(-1)
    assert ((flat >= t['lo']) & (flat < t['hi'])).all(), \
        'small offsets escaped the static window — fast path never runs'


def test_visit_tables_cover_all_cells():
    tables = mp._visit_tables(2, 16, 16, ((16, 16), (8, 8)), 4, 32, 128, 2)
    assert tables is not None
    nk = tables['nk']
    assert nk == 2 * tables['nr']
    # every sample belongs to at least one run (lo/hi populated)
    assert (tables['hi'] > 0).all()
    # runs' zero flags: exactly one first-visit per range
    assert tables['vzero'].sum() == nk


@pytest.mark.parametrize('dtype', ['float32', 'bfloat16'])
def test_postgather_fwd_kernel_matches_xla_tail(monkeypatch, dtype):
    """The post-gather fusion kernel (corner weighting + fold + p-sum
    in VMEM) must match the pure-XLA tail bit-for-bit in its product
    contract (bf16 products are exact in the f32 corner sum)."""
    monkeypatch.setattr(mp, 'CH', 16)
    monkeypatch.setattr(mp, '_POSTGATHER_KCH', 2)
    rng = np.random.RandomState(3)
    value, lx, ly, wt = _inputs(rng, 1.0)
    value = value.astype(dtype)
    b, l, p = lx.shape
    args = (value, lx.reshape(b, l * p), ly.reshape(b, l * p),
            wt.reshape(b, l * p), p)
    ref = mp._sample_psum_ref(*args)            # XLA tail (CPU path)
    monkeypatch.setattr(mp, '_FORCE_POSTGATHER', True)
    assert mp._postgather_ok(l * p, p, D)
    out = mp._sample_psum_ref(*args)            # kernel (interpreted)
    tol = 1e-6 if dtype == 'float32' else 1e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol)


def _to_pm(a):
    """(BH, L, P) -> p-major flat (BH, P*L)."""
    b, l, p = a.shape
    return jnp.transpose(a, (0, 2, 1)).reshape(b, p * l)


@pytest.mark.parametrize('offset_scale', [0.8, 20.0])
def test_pmajor_entry_matches_pminor_and_oracle(small_kernel_params,
                                                offset_scale):
    """The p-major flat entry must agree with the (query, point)-order
    entry and with plain autodiff through the XLA oracle — both the
    windowed Pallas d(patch) branch (small offsets) and the scatter
    fallback (huge offsets)."""
    rng = np.random.RandomState(0)
    value, lx, ly, wt = _inputs(rng, offset_scale)
    tables = mp._visit_tables_pm(BH, H, W, GRIDS, P, mp.CH, mp.RNG,
                                 mp.MARGIN_ROWS)
    assert tables is not None
    cot = jnp.asarray(rng.randn(*_oracle(value, lx, ly, wt).shape)
                      .astype(np.float32))

    def loss_pm(v, x, y, w):
        return (mp.msda_sample_psum_pm(
            v, _to_pm(x), _to_pm(y), _to_pm(w), GRIDS, P) * cot).sum()

    def loss_ref(v, x, y, w):
        return (_oracle(v, x, y, w) * cot).sum()

    out_pm = mp.msda_sample_psum_pm(value, _to_pm(lx), _to_pm(ly),
                                    _to_pm(wt), GRIDS, P)
    out_r = _oracle(value, lx, ly, wt)
    np.testing.assert_allclose(np.asarray(out_pm), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)

    g_c = jax.grad(loss_pm, argnums=(0, 1, 2, 3))(value, lx, ly, wt)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(value, lx, ly, wt)
    for a, b, name in zip(g_c, g_r, ['value', 'loc_x', 'loc_y', 'w']):
        # _to_pm sits inside loss_pm, so grads arrive in the original
        # (BH, L, P) shapes for both sides — compare directly
        atol = 2e-2 if name == 'value' else 2e-3
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=atol,
            err_msg=f'pm grad mismatch: {name} (offset={offset_scale})')


def test_pmajor_visit_tables_cover_all_cells():
    t = mp._visit_tables_pm(2, 16, 16, ((16, 16), (8, 8)), 4, 32, 128, 2)
    assert t is not None
    assert t['nk'] == 2 * t['nr']
    assert (t['hi'] > 0).all()
    assert t['vzero'].sum() == t['nk']


@pytest.mark.parametrize('dy_rows', [0.5, 6.5, 40.0])
def test_pmajor_margin_tiers(small_kernel_params, monkeypatch, dy_rows):
    """Two-tier static window: constant vertical offsets of 0.5 rows
    (tight margin-5 schedule), 6.5 rows (escapes tight, fits the
    margin-8 schedule) and 40 rows (escapes both -> exact XLA scatter)
    must all match the autodiff oracle."""
    monkeypatch.setattr(mp, 'MARGIN_ROWS', 8)
    rng = np.random.RandomState(1)
    value, lx, ly, wt = _inputs(rng, 0.0)     # offsets = 0 at refs
    ly = ly + dy_rows / H                      # constant row offset
    cot = jnp.asarray(rng.randn(*_oracle(value, lx, ly, wt).shape)
                      .astype(np.float32))

    def loss_pm(v, x, y, w):
        return (mp.msda_sample_psum_pm(
            v, _to_pm(x), _to_pm(y), _to_pm(w), GRIDS, P) * cot).sum()

    def loss_ref(v, x, y, w):
        return (_oracle(v, x, y, w) * cot).sum()

    out_pm = mp.msda_sample_psum_pm(value, _to_pm(lx), _to_pm(ly),
                                    _to_pm(wt), GRIDS, P)
    np.testing.assert_allclose(
        np.asarray(out_pm), np.asarray(_oracle(value, lx, ly, wt)),
        rtol=1e-5, atol=1e-5)
    g_c = jax.grad(loss_pm, argnums=(0, 1, 2, 3))(value, lx, ly, wt)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(value, lx, ly, wt)
    for a, b, name in zip(g_c, g_r, ['value', 'loc_x', 'loc_y', 'w']):
        atol = 2e-2 if name == 'value' else 2e-3
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=atol,
            err_msg=f'tier grad mismatch: {name} (dy={dy_rows})')
