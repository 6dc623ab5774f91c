"""End-to-end DiscoBox tests: losses, mean-field CRF, teacher-student step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from boxinstseg_tpu.registry import build_detector

H, W = 128, 128
NUM_CLASSES = 4
MAX_GT = 4
K = 8


def tiny_cfg():
    return dict(
        type='DiscoBoxSOLOv2',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=0, num_outs=5),
        bbox_head=dict(
            type='DiscoBoxSOLOv2Head', num_classes=NUM_CLASSES,
            in_channels=32, seg_feat_channels=16, stacked_convs=1,
            strides=[8, 8, 16, 32, 32],
            scale_ranges=((1, 48), (24, 96), (48, 192), (96, 384),
                          (192, 2048)),
            sigma=0.2, num_grids=[12, 10, 8, 6, 4], ins_out_channels=16,
            loss_ins=dict(type='DiceLoss', use_sigmoid=True,
                          loss_weight=1.0),
            loss_ts=dict(type='DiceLoss', momentum=0.99,
                         use_ind_teacher=True, loss_weight=1.0, kernel=3,
                         max_iter=3, alpha0=2.0, theta0=0.5, theta1=30.0,
                         theta2=20.0, base=0.10),
            loss_cate=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                           alpha=0.25, loss_weight=1.0),
            max_pos=K),
        mask_feat_head=dict(type='DiscoBoxMaskFeatHead', in_channels=32,
                            out_channels=16, start_level=0, end_level=3,
                            num_classes=16,
                            norm_cfg=dict(type='GN', num_groups=8)),
        test_cfg=dict(nms_pre=50, score_thr=0.1, mask_thr=0.4,
                      filter_thr=0.05, kernel='gaussian', sigma=2.0,
                      max_per_img=10),
    )


def synth_batch(rng, b=2):
    from test_boxlevelset_model import synth_batch as sb
    return sb(rng, b)


@pytest.fixture(scope='module')
def setup():
    model = build_detector(tiny_cfg())
    batch = synth_batch(np.random.RandomState(0))
    from boxinstseg_tpu.engine import init_variables
    variables = init_variables(
        model, {'params': jax.random.PRNGKey(0)}, batch,
        jnp.zeros((), jnp.int32), None, None, method=model.loss)
    return model, variables, batch


def test_losses_finite_and_gated(setup):
    model, variables, batch = setup

    @jax.jit
    def run(gate_ts):
        gates = dict(teacher=jnp.float32(0.0), ts=gate_ts)
        return model.apply(variables, batch, jnp.zeros((), jnp.int32),
                           None, gates, method=model.loss)

    l_on = run(jnp.float32(1.0))
    l_off = run(jnp.float32(0.0))
    for k in ('loss_ins', 'loss_ts', 'loss_cate'):
        assert np.isfinite(float(l_on[k])), k
    assert float(l_off['loss_ts']) == pytest.approx(0.0)
    assert float(l_on['loss_ts']) >= 0
    assert float(l_on['loss_ins']) > 0


def test_ts_train_step_and_teacher_ema(setup):
    model, variables, batch = setup
    from boxinstseg_tpu.engine import (build_optimizer, create_train_state,
                                       make_ts_train_step,
                                       step_lr_schedule)
    tx = build_optimizer(
        dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=1e-4),
        step_lr_schedule(0.01, warmup=None, warmup_iters=0))
    state = create_train_state(model, variables, tx, ema=True)
    step = make_ts_train_step(model, tx, mesh=None, momentum=0.9,
                              start_iter=2, donate=False)

    # before start_iter the teacher must exactly track the student
    for _ in range(2):
        state, logs = step(state, batch)
        assert np.isfinite(float(logs['loss']))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.ema_params, state.params)
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0

    # after start_iter it must lag (EMA)
    for _ in range(2):
        state, logs = step(state, batch)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.ema_params, state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0
    # avg_loss_ins follows the 0.9/0.1 EMA from init 2.0
    assert 0 < float(state.avg_loss_ins) < 2.0


def test_meanfield_crf_pseudo_labels():
    from boxinstseg_tpu.models.dense_heads.discobox_head import MeanFieldCRF
    rng = np.random.RandomState(0)
    h = w = 32
    # image with a clear square object
    img = np.zeros((1, h, w, 3), np.float32)
    img[:, 8:24, 8:24] = 1.0
    crf = MeanFieldCRF(num_iter=5)
    kernel = crf.build_kernel(jnp.asarray(img))
    # noisy initial mask covering roughly the object
    x = np.zeros((1, 1, h, w), np.float32)
    x[:, :, 8:24, 8:24] = 0.8
    x += rng.rand(1, 1, h, w).astype(np.float32) * 0.1
    target = np.zeros((1, 1, h, w), np.float32)
    target[:, :, 6:26, 6:26] = 1.0   # box mask
    pseudo = crf(kernel, jnp.asarray(x), jnp.asarray(target))
    p = np.asarray(pseudo)[0, 0]
    assert p[16, 16] == 1.0          # object center labeled fg
    assert p[2, 2] == 0.0            # outside box labeled bg
    assert set(np.unique(p)) <= {0.0, 1.0}


def test_predict_shapes(setup):
    model, variables, batch = setup
    out = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))(
        variables, batch)
    d = out['scores'].shape[1]
    assert out['masks'].shape == (2, d, H // 4, W // 4)
    assert out['labels'].shape == (2, d)


def test_corr_loss_and_bank_threading():
    """Full TS step with the cross-image correspondence branch enabled:
    bank lives in TrainState, loss_corr is finite, appends happen when
    the gate opens."""
    cfg = tiny_cfg()
    cfg['bbox_head']['loss_corr'] = dict(
        type='InfoNCE', loss_weight=1.0, corr_exp=1.0, corr_eps=0.05,
        gaussian_filter_size=3, low_score=0.3, corr_num_iter=2,
        corr_num_smooth_iter=1, dist_kernel=5,
        obj_bank=dict(len_object_queues=8, fg_iou_thresh=0.5,
                      bg_iou_thresh=0.5, ratio_range=[0.5, 2.0],
                      appear_thresh=0.5, max_retrieval_objs=5,
                      feat_height=7, feat_width=7, mask_height=14,
                      mask_width=14, min_size=2, num_gpu_bank=4))
    cfg['bbox_head']['max_corr_queries'] = 4
    model = build_detector(cfg)
    batch = synth_batch(np.random.RandomState(0))
    from boxinstseg_tpu.engine import (build_optimizer, create_train_state,
                                       init_variables, make_ts_train_step,
                                       step_lr_schedule)
    from boxinstseg_tpu.ops.correspondence import create_object_bank
    bank = create_object_bank(NUM_CLASSES, 8, (7, 7), (14, 14),
                              feat_dim=32)
    variables = init_variables(
        model, {'params': jax.random.PRNGKey(0)}, batch,
        jnp.zeros((), jnp.int32), None, None, bank, method=model.loss)
    tx = build_optimizer(
        dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=1e-4),
        step_lr_schedule(0.01, warmup=None, warmup_iters=0))
    state = create_train_state(model, variables, tx, ema=True,
                               corr_state=bank)
    # force the gates open from the start
    state = state.replace(avg_loss_ins=jnp.asarray(0.1, jnp.float32))
    step = make_ts_train_step(model, tx, mesh=None, momentum=0.9,
                              start_iter=0, donate=False)
    state, logs = step(state, batch)
    assert np.isfinite(float(logs['loss'])), logs
    assert 'loss_corr' in logs
    assert np.isfinite(float(logs['loss_corr']))
    # the bank received appends (synthetic boxes exceed min_size=2)
    assert int(state.corr_state.count.sum()) > 0
    # second step: retrieval may now fire; still finite
    state, logs = step(state, batch)
    assert np.isfinite(float(logs['loss']))


def test_crf_pallas_kernel_matches_xla():
    """The VMEM-resident CRF kernel (interpret mode) reproduces the XLA
    compare-loop exactly (same fixed point as the reference exp update,
    see test_golden_meanfield_crf)."""
    from boxinstseg_tpu.models.dense_heads.discobox_head import MeanFieldCRF
    from boxinstseg_tpu.ops.pallas_kernels import crf_mean_field_pallas
    rng = np.random.RandomState(1)
    b, k, h, w = 2, 5, 16, 24
    img = rng.rand(b, h, w, 3).astype(np.float32)
    crf = MeanFieldCRF(num_iter=4)
    kernel = crf.build_kernel(jnp.asarray(img))
    x = (rng.rand(b, k, h, w) > 0.5).astype(np.float32)
    targets = np.zeros((b, k, h, w), np.float32)
    targets[:, :, 3:14, 4:20] = 1.0

    want = np.asarray(crf(kernel, jnp.asarray(x), jnp.asarray(targets)))

    # rebuild kv exactly as __call__ does
    kv = 0.0
    for o, (dy, dx) in enumerate(crf.offsets):
        m = np.zeros((h, w), np.float32)
        ys = slice(max(dy, 0), h + min(dy, 0))
        xs = slice(max(dx, 0), w + min(dx, 0))
        m[ys, xs] = 1.0
        kv = kv + np.asarray(kernel)[:, o] * m
    bin0 = (jnp.asarray(x) * targets > 0.5).astype(jnp.float32)
    got = np.asarray(crf_mean_field_pallas(
        kernel, jnp.asarray(0.5 * kv), bin0, jnp.asarray(targets),
        crf.offsets, crf.num_iter, k_tile=2, interpret=True))
    np.testing.assert_array_equal(got, want)
