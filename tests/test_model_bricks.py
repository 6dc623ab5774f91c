"""Golden tests for models/utils bricks vs the reference torch code and
torch functional oracles."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from ref_oracle import load_ref, ref_available  # noqa: E402

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason='reference tree not mounted')

GT = 'mmdet/models/utils/gaussian_target.py'


def test_golden_gaussian_suite():
    from boxinstseg_tpu.models.utils import (gaussian2D, gaussian_radius,
                                             gen_gaussian_target,
                                             get_local_maximum,
                                             get_topk_from_heatmap,
                                             transpose_and_gather_feat)
    ns = load_ref(GT, ['gaussian2D', 'gen_gaussian_target',
                       'gaussian_radius', 'get_local_maximum',
                       'get_topk_from_heatmap', 'gather_feat',
                       'transpose_and_gather_feat'],
                  extra_ns={'sqrt': torch.sqrt})
    # gaussian2D
    np.testing.assert_allclose(
        np.asarray(gaussian2D(3, sigma=7 / 6)),
        ns['gaussian2D'](3, sigma=7 / 6).numpy(), rtol=1e-6)
    # radius formula
    for size, ov in (((10., 30.), 0.7), ((5., 5.), 0.3), ((40., 8.), 0.5)):
        np.testing.assert_allclose(
            float(gaussian_radius(size, ov)),
            float(ns['gaussian_radius'](torch.tensor(size), ov)),
            rtol=1e-6)
    # splat, including an edge-clipped center
    torch.manual_seed(0)
    hm = torch.rand(12, 16)
    for center, radius in (((5, 4), 3), ((1, 10), 4), ((15, 0), 2)):
        want = ns['gen_gaussian_target'](hm.clone(), center, radius)
        got = gen_gaussian_target(jnp.asarray(hm.numpy()), center, radius)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-5, atol=1e-7)
    # local max + topk + gather
    heat = torch.rand(2, 3, 8, 9)
    np.testing.assert_allclose(
        np.asarray(get_local_maximum(jnp.asarray(heat.numpy()))),
        ns['get_local_maximum'](heat).numpy(), rtol=1e-6)
    ts, ti, tc, ty, tx = ns['get_topk_from_heatmap'](heat, k=5)
    s, i, c, y, x = get_topk_from_heatmap(jnp.asarray(heat.numpy()), k=5)
    np.testing.assert_allclose(np.asarray(s), ts.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), ti.numpy())
    np.testing.assert_array_equal(np.asarray(c), tc.numpy())
    np.testing.assert_allclose(np.asarray(y), ty.numpy().astype(float))
    np.testing.assert_allclose(np.asarray(x), tx.numpy())
    feat = torch.rand(2, 4, 8, 9)
    want = ns['transpose_and_gather_feat'](feat, ti)
    got = transpose_and_gather_feat(jnp.asarray(feat.numpy()),
                                    jnp.asarray(ti.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-6)


def test_golden_point_sample_and_uncertainty():
    from boxinstseg_tpu.models.utils import (
        get_uncertain_point_coords_with_randomness, get_uncertainty,
        point_sample)
    torch.manual_seed(1)
    feats = torch.rand(2, 3, 10, 12)
    pts = torch.rand(2, 7, 2)
    # mmcv point_sample == grid_sample on [-1,1] coords, align_corners=False
    grid = 2.0 * pts - 1.0
    want = F.grid_sample(feats, grid.unsqueeze(2), align_corners=False
                         ).squeeze(3)
    got = point_sample(jnp.asarray(feats.numpy()), jnp.asarray(pts.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                               atol=1e-6)

    labels = jnp.asarray(np.array([1, 2], np.int32))
    unc = get_uncertainty(jnp.asarray(feats.numpy()), labels)
    want_unc = -np.abs(feats.numpy()[np.arange(2), [1, 2]][:, None])
    np.testing.assert_allclose(np.asarray(unc), want_unc, rtol=1e-6)

    coords = get_uncertain_point_coords_with_randomness(
        jnp.asarray(feats.numpy()), labels, num_points=16,
        oversample_ratio=3, importance_sample_ratio=0.75,
        rng=jax.random.PRNGKey(0))
    assert coords.shape == (2, 16, 2)
    assert (np.asarray(coords) >= 0).all() and (np.asarray(coords) <= 1).all()


def test_golden_make_divisible_and_pool():
    from boxinstseg_tpu.models.utils import (adaptive_avg_pool2d,
                                             make_divisible)
    ns = load_ref('mmdet/models/utils/make_divisible.py',
                  ['make_divisible'])
    for v, d in ((37, 8), (64, 8), (3, 8), (100, 6)):
        assert make_divisible(v, d) == ns['make_divisible'](v, d)
    torch.manual_seed(2)
    x = torch.rand(2, 5, 11, 13)
    for out in (1, (3, 4), (5, 2)):
        want = F.adaptive_avg_pool2d(x, out)
        got = adaptive_avg_pool2d(
            jnp.asarray(x.permute(0, 2, 3, 1).numpy()), out)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want.numpy(), rtol=1e-5, atol=1e-6)


def test_golden_normed_predictors():
    from boxinstseg_tpu.models.utils import NormedConv2d, NormedLinear
    class _Reg:
        def register_module(self, *a, **k):
            def deco(c):
                return c
            return deco

    ns = load_ref('mmdet/models/utils/normed_predictor.py',
                  ['NormedLinear', 'NormedConv2d'],
                  extra_ns={'CONV_LAYERS': _Reg(),
                            'LINEAR_LAYERS': _Reg()})
    torch.manual_seed(3)
    ref_lin = ns['NormedLinear'](6, 4, tempearture=20)
    x = torch.rand(5, 6)
    want = ref_lin(x).detach().numpy()
    ours = NormedLinear(4)
    params = {'params': {'kernel': jnp.asarray(
        ref_lin.weight.detach().numpy().T),
        'bias': jnp.asarray(ref_lin.bias.detach().numpy())}}
    got = ours.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                               atol=1e-5)

    ref_conv = ns['NormedConv2d'](6, 4, 1, bias=False)
    xi = torch.rand(2, 6, 7, 8)
    want = ref_conv(xi).detach().numpy()
    oc = NormedConv2d(4, kernel_size=1)
    w = ref_conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    got = oc.apply({'params': {'kernel': jnp.asarray(w)}},
                   jnp.asarray(xi.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want, rtol=1e-4, atol=1e-5)


def test_brick_modules_shapes():
    from boxinstseg_tpu.models.utils import (ConvUpsample, DyReLU,
                                             InvertedResidual, SELayer,
                                             SimplifiedBasicBlock,
                                             interpolate_as, scale_target,
                                             sigmoid_geometric_mean)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 8, 10, 16))
    for mod in (SELayer(16, ratio=4), DyReLU(16, ratio=4)):
        v = mod.init(rng, x)
        assert mod.apply(v, x).shape == x.shape
    ir = InvertedResidual(16, 24, 48, stride=2)
    v = ir.init(rng, x)
    assert ir.apply(v, x, mutable=['batch_stats'])[0].shape == (2, 4, 5, 24)
    ir2 = InvertedResidual(16, 16, 32, stride=1, se_ratio=4)
    v = ir2.init(rng, x)
    assert ir2.apply(v, x, mutable=['batch_stats'])[0].shape == x.shape
    cu = ConvUpsample(12, num_layers=2, num_upsample=2)
    v = cu.init(rng, x)
    assert cu.apply(v, x, mutable=['batch_stats'])[0].shape == (2, 32, 40, 12)
    sb = SimplifiedBasicBlock(16)
    v = sb.init(rng, x)
    assert sb.apply(v, x, mutable=['batch_stats'])[0].shape == x.shape

    # function parity vs torch for the interpolation helpers
    torch.manual_seed(4)
    src = torch.rand(2, 6, 7)
    want = F.interpolate(src[:, None], size=(12, 14), mode='bilinear',
                         align_corners=False)[:, 0]
    got = interpolate_as(jnp.asarray(src.numpy()), jnp.zeros((12, 14)))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                               atol=1e-6)
    got2 = scale_target(jnp.asarray(src.numpy()), (12, 14))
    np.testing.assert_allclose(np.asarray(got2), want.numpy(), rtol=1e-5,
                               atol=1e-6)

    a, b = torch.randn(4), torch.randn(4)
    want = (a.sigmoid() * b.sigmoid()).sqrt().numpy()
    got = sigmoid_geometric_mean(jnp.asarray(a.numpy()),
                                 jnp.asarray(b.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
