"""New transformer bricks + fallback plugins: DynamicConv and
LearnedPositionalEncoding golden vs the reference's own torch code;
DropBlock / pixel-decoder behavior tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from ref_oracle import load_ref, ref_available, to_np, to_torch

TRANSFORMER = 'mmdet/models/utils/transformer.py'


def _ref_module_ns():
    import torch.nn as nn

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    class _Reg:
        def register_module(self, *a, **k):
            return lambda obj: obj

    return dict(
        BaseModule=BaseModule, TRANSFORMER=_Reg(),
        build_norm_layer=lambda cfg, dims: ('ln', nn.LayerNorm(dims)),
        build_activation_layer=lambda cfg: nn.ReLU(),
    )


@pytest.mark.skipif(not ref_available(), reason='reference not mounted')
def test_golden_dynamic_conv(rng):
    import torch
    from boxinstseg_tpu.models.utils import DynamicConv

    RefDC = load_ref(TRANSFORMER, ['DynamicConv'],
                     extra_ns=_ref_module_ns())['DynamicConv']
    torch.manual_seed(0)
    ref = RefDC(in_channels=16, feat_channels=8, input_feat_shape=3).eval()

    n, hw = 4, 9
    pf = rng.randn(n, 16).astype(np.float32)
    xf = rng.randn(n, 16, 3, 3).astype(np.float32)
    with torch.no_grad():
        want = to_np(ref(to_torch(pf), to_torch(xf)))

    mine = DynamicConv(in_channels=16, feat_channels=8, input_feat_shape=3)
    sd = {k: to_np(v) for k, v in ref.state_dict().items()}
    params = {
        'dynamic_layer': {'kernel': sd['dynamic_layer.weight'].T,
                          'bias': sd['dynamic_layer.bias']},
        'norm_in': {'scale': sd['norm_in.weight'],
                    'bias': sd['norm_in.bias']},
        'norm_out': {'scale': sd['norm_out.weight'],
                     'bias': sd['norm_out.bias']},
        'fc_layer': {'kernel': sd['fc_layer.weight'].T,
                     'bias': sd['fc_layer.bias']},
        'fc_norm': {'scale': sd['fc_norm.weight'],
                    'bias': sd['fc_norm.bias']},
    }
    # torch input (n, c, h, w).flatten(2).permute(0, 2, 1) -> (n, hw, c)
    x_seq = xf.reshape(n, 16, hw).transpose(0, 2, 1)
    got = mine.apply({'params': params}, jnp.asarray(pf),
                     jnp.asarray(x_seq))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(not ref_available(), reason='reference not mounted')
def test_golden_learned_positional_encoding(rng):
    import torch
    from boxinstseg_tpu.models.utils import LearnedPositionalEncoding

    ns = _ref_module_ns()
    ns['POSITIONAL_ENCODING'] = ns['TRANSFORMER']
    RefPE = load_ref('mmdet/models/utils/positional_encoding.py',
                     ['LearnedPositionalEncoding'], extra_ns=ns)[
        'LearnedPositionalEncoding']
    torch.manual_seed(0)
    ref = RefPE(num_feats=6, row_num_embed=10, col_num_embed=12).eval()
    h, w = 5, 7
    with torch.no_grad():
        want = to_np(ref(torch.zeros(2, h, w)))          # (2, 12, h, w)

    mine = LearnedPositionalEncoding(num_feats=6, row_num_embed=10,
                                     col_num_embed=12)
    params = {
        'row_embed': {'embedding': to_np(ref.row_embed.weight)},
        'col_embed': {'embedding': to_np(ref.col_embed.weight)},
    }
    got = mine.apply({'params': params}, 2, h, w)        # (2, h, w, 12)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want, rtol=1e-6, atol=1e-6)


def test_dropblock_semantics(rng):
    from boxinstseg_tpu.models.plugins import DropBlock

    x = jnp.ones((2, 16, 16, 4))
    mod = DropBlock(drop_prob=0.3, block_size=3, warmup_iters=0)
    # eval: identity
    assert np.allclose(mod.apply({}, x, train=False), np.asarray(x))
    y = mod.apply({}, x, train=True,
                  rngs={'dropout': jax.random.PRNGKey(0)})
    y = np.asarray(y)
    assert (y == 0).any(), 'no blocks dropped at drop_prob=0.3'
    # kept values renormalized upward, mean approximately preserved
    kept = y[y > 0]
    assert kept.min() > 1.0
    assert abs(y.mean() - 1.0) < 0.05
    # warmup gates gamma to 0 at iteration 0
    z = DropBlock(drop_prob=0.3, block_size=3, warmup_iters=100).apply(
        {}, x, train=True, iteration=jnp.zeros((), jnp.int32),
        rngs={'dropout': jax.random.PRNGKey(0)})
    assert np.allclose(np.asarray(z), np.asarray(x))


@pytest.mark.parametrize('cls_name', ['PixelDecoder',
                                      'TransformerEncoderPixelDecoder'])
def test_pixel_decoder_shapes(cls_name, rng):
    import boxinstseg_tpu.models.plugins as P
    cls = getattr(P, cls_name)
    kw = dict(in_channels=(8, 16, 32), feat_channels=16, out_channels=16,
              norm_cfg=dict(type='GN', num_groups=4))
    if cls_name == 'TransformerEncoderPixelDecoder':
        kw.update(num_encoder_layers=1, num_heads=4,
                  feedforward_channels=32)
    mod = cls(**kw)
    feats = [jnp.asarray(rng.randn(2, 16 // (2 ** i), 16 // (2 ** i), c),
                         jnp.float32)
             for i, c in enumerate(kw['in_channels'])]
    variables = mod.init(jax.random.PRNGKey(0), feats)
    mask_feat, memory = mod.apply(variables, feats)
    assert mask_feat.shape == (2, 16, 16, 16)
    assert memory.shape[0] == 2 and memory.shape[1] == 4


def test_detr_encoder_decoder_stacks(rng):
    from boxinstseg_tpu.models.utils import (DetrTransformerDecoder,
                                             DetrTransformerEncoder)
    x = jnp.asarray(rng.randn(2, 12, 16), jnp.float32)
    pos = jnp.asarray(rng.randn(2, 12, 16), jnp.float32)
    enc = DetrTransformerEncoder(num_layers=2, embed_dims=16, num_heads=4,
                                 feedforward_channels=32)
    v = enc.init(jax.random.PRNGKey(0), x, pos)
    y = enc.apply(v, x, pos)
    assert y.shape == x.shape
    # padding mask blocks attention to padded keys: with all-but-one
    # position padded, output differs from the unmasked run
    mask = jnp.zeros((2, 12), bool).at[:, 1:].set(True)
    y_masked = enc.apply(v, x, pos, mask)
    assert not np.allclose(np.asarray(y), np.asarray(y_masked))

    q = jnp.asarray(rng.randn(2, 5, 16), jnp.float32)
    qp = jnp.zeros_like(q)
    dec = DetrTransformerDecoder(num_layers=3, embed_dims=16, num_heads=4,
                                 feedforward_channels=32)
    vd = dec.init(jax.random.PRNGKey(0), q, x, x, qp, pos)
    outs = dec.apply(vd, q, x, x, qp, pos)
    assert len(outs) == 3 and outs[0].shape == q.shape
