"""Golden-value tests for the round-2 loss-zoo completions (DIoU/CIoU/
BoundedIoU, Seesaw, AssociativeEmbedding, PISA) against the reference's
own torch code, AST-extracted from /root/reference at test time."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from ref_oracle import load_ref, ref_available  # noqa: E402

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason='reference tree not mounted')

IOU = 'mmdet/models/losses/iou_loss.py'
UTILS = 'mmdet/models/losses/utils.py'
SEESAW = 'mmdet/models/losses/seesaw_loss.py'
AE = 'mmdet/models/losses/ae_loss.py'
PISA = 'mmdet/models/losses/pisa_loss.py'
CE = 'mmdet/models/losses/cross_entropy_loss.py'


def _rand_boxes(rng, n):
    xy = rng.uniform(0, 50, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def _iou_ns():
    import math
    return load_ref(IOU, ['bounded_iou_loss', 'diou_loss', 'ciou_loss'],
                    extra_ns={'weighted_loss': lambda f: f, 'math': math})


@pytest.mark.parametrize('name', ['diou', 'ciou'])
def test_golden_diou_ciou(name):
    from boxinstseg_tpu.models.losses import CIoULoss, DIoULoss
    rng = np.random.default_rng(0)
    pred, target = _rand_boxes(rng, 24), _rand_boxes(rng, 24)
    weight = rng.uniform(0.1, 2.0, (24,)).astype(np.float32)
    ns = _iou_ns()
    ref_fn = ns['diou_loss'] if name == 'diou' else ns['ciou_loss']
    elem = ref_fn(torch.from_numpy(pred),
                  torch.from_numpy(target)).numpy()  # elementwise (n,)
    ref = (elem * weight).sum() / 7.0
    ours_cls = DIoULoss() if name == 'diou' else CIoULoss()
    ours = ours_cls(jnp.asarray(pred), jnp.asarray(target),
                    weight=jnp.asarray(weight), avg_factor=7.0)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-5,
                               atol=2e-6)


def test_golden_bounded_iou():
    from boxinstseg_tpu.models.losses import BoundedIoULoss
    rng = np.random.default_rng(1)
    pred, target = _rand_boxes(rng, 16), _rand_boxes(rng, 16)
    weight = rng.uniform(0.1, 2.0, (16, 4)).astype(np.float32)
    ns = _iou_ns()
    elem = ns['bounded_iou_loss'](
        torch.from_numpy(pred), torch.from_numpy(target),
        beta=0.2).numpy()                             # elementwise (n, 4)
    ref = (elem * weight).sum() / 9.0
    ours = BoundedIoULoss(beta=0.2)(
        jnp.asarray(pred), jnp.asarray(target), weight=jnp.asarray(weight),
        avg_factor=9.0)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-5,
                               atol=2e-6)


def test_golden_seesaw():
    from boxinstseg_tpu.models.losses import SeesawLoss
    torch.manual_seed(0)
    C, N = 6, 20
    ce_ns = load_ref(CE, ['cross_entropy'],
                     extra_ns=load_ref(UTILS, ['weight_reduce_loss',
                                               'reduce_loss']))
    acc_ns = load_ref('mmdet/models/losses/accuracy.py', ['accuracy'])
    RefSeesaw = load_ref(
        SEESAW, ['seesaw_ce_loss', 'SeesawLoss'],
        extra_ns={**ce_ns, **acc_ns,
                  **load_ref(UTILS, ['weight_reduce_loss',
                                     'reduce_loss'])})['SeesawLoss']
    ref_mod = RefSeesaw(p=0.8, q=2.0, num_classes=C, eps=1e-2)
    # pre-seed the running buffer with an imbalanced history
    seed_counts = torch.tensor([100., 40., 7., 3., 1., 0., 25.])
    ref_mod.cum_samples += seed_counts
    cls_score = torch.randn(N, C + 2)
    labels = torch.randint(0, C + 1, (N,))
    ref_out = ref_mod(cls_score.clone(), labels.clone())

    ours = SeesawLoss(p=0.8, q=2.0, num_classes=C, eps=1e-2)
    cum = jnp.asarray(seed_counts.numpy())
    cum = ours.update_cum_samples(cum, jnp.asarray(labels.numpy()))
    np.testing.assert_allclose(np.asarray(cum),
                               ref_mod.cum_samples.numpy(), rtol=1e-6)
    out = ours(jnp.asarray(cls_score.numpy()), jnp.asarray(labels.numpy()),
               cum)
    for key in ('loss_cls_objectness', 'loss_cls_classes'):
        np.testing.assert_allclose(np.asarray(out[key]),
                                   ref_out[key].detach().numpy(),
                                   rtol=1e-4, atol=1e-6)
    # activation hook
    act = ours.get_activation(jnp.asarray(cls_score.numpy()))
    ref_act = ref_mod.get_activation(cls_score)
    np.testing.assert_allclose(np.asarray(act), ref_act.numpy(), rtol=1e-5,
                               atol=1e-7)


def test_golden_ae_loss():
    from boxinstseg_tpu.models.losses import ae_loss_per_image
    torch.manual_seed(1)
    ref_fn = load_ref(AE, ['ae_loss_per_image'])['ae_loss_per_image']
    C, H, W = 4, 8, 9
    tl = torch.randn(C, H, W)
    br = torch.randn(C, H, W)
    match = [[[2, 3], [5, 6]], [[1, 1], [7, 8]], [[0, 4], [3, 2]]]
    ref_pull, ref_push = ref_fn(tl, br, match)

    K = 5  # padded capacity
    m = np.zeros((K, 2, 2), np.int32)
    m[:3] = np.array(match)
    valid = np.array([True] * 3 + [False] * 2)
    pull, push = ae_loss_per_image(
        jnp.asarray(tl.permute(1, 2, 0).numpy()),
        jnp.asarray(br.permute(1, 2, 0).numpy()),
        jnp.asarray(m), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(pull), ref_pull.numpy(),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(push), ref_push.numpy(),
                               rtol=1e-5)
    # single-object case (N = 1 * C in the reference's flattened view)
    ref_pull1, ref_push1 = ref_fn(tl, br, match[:1])
    pull1, push1 = ae_loss_per_image(
        jnp.asarray(tl.permute(1, 2, 0).numpy()),
        jnp.asarray(br.permute(1, 2, 0).numpy()),
        jnp.asarray(m), jnp.asarray(np.array([True] + [False] * 4)))
    np.testing.assert_allclose(np.asarray(pull1), ref_pull1.numpy(),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(push1), ref_push1.numpy(),
                               rtol=1e-5)


def test_golden_carl_loss():
    from boxinstseg_tpu.models.losses import carl_loss
    torch.manual_seed(2)
    ref_fn = load_ref(PISA, ['carl_loss'])['carl_loss']
    N, C = 14, 5
    cls_score = torch.randn(N, C)
    labels = torch.randint(0, C + 1, (N,))  # C == background
    bbox_pred = torch.randn(N, 4)
    bbox_targets = torch.randn(N, 4)

    def ref_l1(p, t, reduction_override='none'):
        return (p - t).abs()

    ref = ref_fn(cls_score, labels, bbox_pred, bbox_targets, ref_l1,
                 k=1, bias=0.2, num_class=C)['loss_carl']
    ours = carl_loss(jnp.asarray(cls_score.numpy()),
                     jnp.asarray(labels.numpy()),
                     jnp.asarray(bbox_pred.numpy()),
                     jnp.asarray(bbox_targets.numpy()),
                     lambda p, t: jnp.abs(p - t), k=1, bias=0.2,
                     num_class=C)['loss_carl']
    np.testing.assert_allclose(np.asarray(ours), ref.numpy().sum(),
                               rtol=1e-5)


def test_golden_isr_p():
    from types import SimpleNamespace

    from boxinstseg_tpu.models.losses import isr_p
    torch.manual_seed(3)
    N, C = 16, 4
    rng = np.random.default_rng(3)
    labels_np = rng.integers(0, C + 1, (N,))
    pos_mask = labels_np < C
    cls_score = torch.randn(N, C)
    bbox_pred = torch.randn(N, 4) * 0.1
    rois = torch.from_numpy(_rand_boxes(rng, N))
    bbox_t = torch.randn(N, 4) * 0.1
    label_weights = torch.ones(N)
    bbox_w = torch.ones(N, 4)
    # per-positive global gt ids (duplicates to exercise the (label,gt)
    # grouped ranking)
    gt_per_pos = rng.integers(0, 3, (int(pos_mask.sum()),))

    def torch_aligned_iou(a, b, is_aligned=True):
        lt = torch.max(a[:, :2], b[:, :2])
        rb = torch.min(a[:, 2:], b[:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, 0] * wh[:, 1]
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / (area_a + area_b - inter).clamp(min=1e-6)

    ref_fn = load_ref(PISA, ['isr_p'],
                      extra_ns={'bbox_overlaps': torch_aligned_iou})['isr_p']

    class Coder:
        def decode(self, r, d):
            return r + d

    def ref_ce(s, l, reduction_override='none'):
        return F.cross_entropy(s, l, reduction='none')

    sr = SimpleNamespace(
        pos_assigned_gt_inds=torch.from_numpy(gt_per_pos.astype(np.int64)))
    ref_labels, ref_w, ref_bt, ref_bw = ref_fn(
        cls_score, bbox_pred,
        (torch.from_numpy(labels_np.astype(np.int64)),
         label_weights.clone(), bbox_t, bbox_w),
        rois, [sr], ref_ce, Coder(), k=2, bias=0, num_class=C)

    # ours: flat (N,) gt ids aligned to samples
    gts = np.zeros((N,), np.int32)
    gts[pos_mask] = gt_per_pos

    def our_ce(s, l, reduction_override='none'):
        return -jax.nn.log_softmax(s, axis=-1)[jnp.arange(s.shape[0]), l]

    _, our_w, _, _ = isr_p(
        jnp.asarray(cls_score.numpy()), jnp.asarray(bbox_pred.numpy()),
        (jnp.asarray(labels_np.astype(np.int32)),
         jnp.ones((N,), jnp.float32), jnp.asarray(bbox_t.numpy()),
         jnp.asarray(bbox_w.numpy())),
        jnp.asarray(rois.numpy()), jnp.asarray(gts),
        our_ce, lambda r, d: r + d, k=2, bias=0, num_class=C)
    np.testing.assert_allclose(np.asarray(our_w), ref_w.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_region_levelset_shared_equivalence():
    """region_levelset_shared must equal the materialized reference form
    (stack([s, 1-s]) * box  vs  img * box per instance)."""
    from boxinstseg_tpu.models.losses import (region_levelset,
                                              region_levelset_shared)
    rng = np.random.default_rng(10)
    B, K, C, H, W = 2, 5, 3, 12, 14
    s = jnp.asarray(rng.random((B, K, H, W)).astype(np.float32))
    box = jnp.asarray((rng.random((B, K, H, W)) > 0.4)
                      .astype(np.float32))
    img = jnp.asarray(rng.standard_normal((B, C, H, W))
                      .astype(np.float32))
    phi = jnp.stack([s, 1.0 - s], axis=2) * box[:, :, None]
    img_pi = img[:, None] * box[:, :, None]
    want = region_levelset(phi.reshape(B * K, 2, H, W),
                           img_pi.reshape(B * K, C, H, W))
    got = region_levelset_shared(s, box, img).reshape(-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # gradients through the phi path must match too
    g_want = jax.grad(lambda ss: region_levelset(
        (jnp.stack([ss, 1.0 - ss], 2) * box[:, :, None]).reshape(
            B * K, 2, H, W),
        img_pi.reshape(B * K, C, H, W)).sum())(s)
    g_got = jax.grad(lambda ss: region_levelset_shared(
        ss, box, img).sum())(s)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=2e-3, atol=2e-4)
