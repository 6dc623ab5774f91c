"""Golden tests for the auxiliary loss zoo round 2: balanced L1, GFL
(QFL/DFL), GHM-C/R, KD KL-div, accuracy — each vs the reference's own
torch code traced from source."""
import numpy as np
import pytest

import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from ref_oracle import load_ref, ref_available, to_np, to_torch

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason='reference tree not mounted')


def _utils_ns():
    return load_ref('mmdet/models/losses/utils.py',
                    ['weight_reduce_loss', 'reduce_loss'])


def test_golden_balanced_l1(rng):
    from boxinstseg_tpu.models.losses import BalancedL1Loss
    ref = load_ref('mmdet/models/losses/balanced_l1_loss.py',
                   ['balanced_l1_loss'],
                   extra_ns=dict(weighted_loss=lambda f: f))[
        'balanced_l1_loss']
    pred = rng.randn(30, 4).astype(np.float32) * 2
    tgt = rng.randn(30, 4).astype(np.float32) * 2
    want = to_np(ref(to_torch(pred), to_torch(tgt), beta=1.0, alpha=0.5,
                     gamma=1.5))
    got = BalancedL1Loss(reduction='none')(jnp.asarray(pred),
                                           jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_golden_quality_focal(rng):
    from boxinstseg_tpu.models.losses import QualityFocalLoss
    ref = load_ref('mmdet/models/losses/gfocal_loss.py',
                   ['quality_focal_loss'],
                   extra_ns=dict(weighted_loss=lambda f: f))[
        'quality_focal_loss']
    n, c = 24, 5
    pred = rng.randn(n, c).astype(np.float32) * 3
    label = rng.randint(0, c + 1, n)          # c == background
    score = rng.rand(n).astype(np.float32)
    want = to_np(ref(to_torch(pred),
                     (to_torch(label.astype(np.int64)), to_torch(score))))
    got = QualityFocalLoss(reduction='none')(
        jnp.asarray(pred), (jnp.asarray(label), jnp.asarray(score)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_golden_distribution_focal(rng):
    from boxinstseg_tpu.models.losses import DistributionFocalLoss
    ref = load_ref('mmdet/models/losses/gfocal_loss.py',
                   ['distribution_focal_loss'],
                   extra_ns=dict(weighted_loss=lambda f: f))[
        'distribution_focal_loss']
    n, bins = 40, 8
    pred = rng.randn(n, bins).astype(np.float32)
    label = (rng.rand(n) * (bins - 1)).astype(np.float32)
    want = to_np(ref(to_torch(pred), to_torch(label)))
    got = DistributionFocalLoss(reduction='none')(jnp.asarray(pred),
                                                  jnp.asarray(label))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_golden_kd_kl_div(rng):
    from boxinstseg_tpu.models.losses import \
        KnowledgeDistillationKLDivLoss
    ref = load_ref('mmdet/models/losses/kd_loss.py',
                   ['knowledge_distillation_kl_div_loss'],
                   extra_ns=dict(weighted_loss=lambda f: f))[
        'knowledge_distillation_kl_div_loss']
    pred = rng.randn(16, 10).astype(np.float32) * 2
    soft = rng.randn(16, 10).astype(np.float32) * 2
    want = to_np(ref(to_torch(pred), to_torch(soft), T=4))
    got = KnowledgeDistillationKLDivLoss(reduction='none', T=4)(
        jnp.asarray(pred), jnp.asarray(soft))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('which', ['GHMC', 'GHMR'])
def test_golden_ghm(which, rng):
    import boxinstseg_tpu.models.losses as L
    ns = _utils_ns()
    ns['_expand_onehot_labels'] = None  # binary-target path only
    RefCls = load_ref('mmdet/models/losses/ghm_loss.py', [which],
                      extra_ns=ns)[which]
    ref = RefCls(bins=10, momentum=0, reduction='mean')
    n, c = 50, 4
    if which == 'GHMC':
        pred = rng.randn(n, c).astype(np.float32) * 2
        target = (rng.rand(n, c) > 0.8).astype(np.float32)
    else:
        pred = rng.randn(n, c).astype(np.float32) * 0.1
        target = rng.randn(n, c).astype(np.float32) * 0.1
    lw = (rng.rand(n, c) > 0.1).astype(np.float32)
    import torch
    with torch.no_grad():
        want = float(ref(to_torch(pred), to_torch(target), to_torch(lw)))
    got = float(getattr(L, which)(bins=10)(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(lw)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_golden_accuracy(rng):
    from boxinstseg_tpu.models.losses import accuracy
    ref = load_ref('mmdet/models/losses/accuracy.py', ['accuracy'],
                   extra_ns=dict(mmcv=__import__('types').SimpleNamespace(
                       jit=lambda **k: (lambda f: f))))['accuracy']
    pred = rng.randn(64, 7).astype(np.float32)
    target = rng.randint(0, 7, 64)
    want = [float(v) for v in ref(to_torch(pred),
                                  to_torch(target.astype(np.int64)),
                                  topk=(1, 3))]
    got = [float(v) for v in accuracy(jnp.asarray(pred),
                                      jnp.asarray(target), topk=(1, 3))]
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # thresholded variant
    want_t = float(ref(to_torch(pred), to_torch(target.astype(np.int64)),
                       topk=1, thresh=0.5))
    got_t = float(accuracy(jnp.asarray(pred), jnp.asarray(target),
                           topk=1, thresh=0.5))
    np.testing.assert_allclose(got_t, want_t, rtol=1e-5)
