"""End-to-end BoxInst model tests on tiny synthetic batches (CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401 (registration)
from boxinstseg_tpu.registry import build_detector

H, W = 128, 160   # divisible by 32; small for CPU
NUM_CLASSES = 4
MAX_GT = 5
CAPACITY = 8


def tiny_boxinst_cfg():
    return dict(
        type='CondInst',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(type='CondInstBoxHead', num_classes=NUM_CLASSES,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128],
                       norm_cfg=dict(type='GN', num_groups=4)),
        mask_branch=dict(type='CondInstMaskBranch', in_channels=32,
                         in_indices=[0, 1, 2], strides=[8, 16, 32],
                         branch_convs=1, branch_channels=16,
                         branch_out_channels=8),
        mask_head=dict(type='CondInstMaskHead', in_channels=8,
                       in_stride=8, out_stride=4, dynamic_convs=3,
                       dynamic_channels=8, topk_per_img=CAPACITY,
                       max_proposals=-1, boxinst_enabled=True,
                       pairwise_warmup=100),
        test_cfg=dict(nms_pre=200, score_thr=0.03,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=10, pre_nms_limit=100),
    )


def synthetic_batch(rng, b=2):
    img = rng.rand(b, H, W, 3).astype(np.float32) * 4 - 2
    boxes = np.zeros((b, MAX_GT, 4), np.float32)
    valid = np.zeros((b, MAX_GT), bool)
    labels = np.zeros((b, MAX_GT), np.int32)
    for i in range(b):
        n = rng.randint(1, MAX_GT + 1)
        for g in range(n):
            x1 = rng.randint(0, W - 40)
            y1 = rng.randint(0, H - 40)
            boxes[i, g] = [x1, y1, x1 + rng.randint(16, 40),
                           y1 + rng.randint(16, 40)]
            labels[i, g] = rng.randint(0, NUM_CLASSES)
            valid[i, g] = True
    return {
        'image': jnp.asarray(img),
        'img_shape': jnp.asarray([[H, W]] * b, jnp.int32),
        'pixels_removed': jnp.asarray([5] * b, jnp.int32),
        'gt_bboxes': jnp.asarray(boxes),
        'gt_labels': jnp.asarray(labels),
        'gt_valid': jnp.asarray(valid),
        'scale_factor': jnp.ones((b, 4), jnp.float32),
    }


@pytest.fixture(scope='module')
def model_and_vars():
    model = build_detector(tiny_boxinst_cfg())
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng)
    from boxinstseg_tpu.engine import init_variables
    variables = init_variables(
        model, {'params': jax.random.PRNGKey(0)},
        batch, jnp.zeros((), jnp.int32), method=model.loss)

    @jax.jit
    def loss_fn(variables, batch, it):
        return model.apply(variables, batch, it, method=model.loss,
                           mutable=['batch_stats'])

    @jax.jit
    def predict_fn(variables, batch):
        return model.apply(variables, batch, method=model.predict)

    return model, variables, loss_fn, predict_fn


def test_loss_forward(model_and_vars):
    model, variables, loss_fn, _ = model_and_vars
    batch = synthetic_batch(np.random.RandomState(1))
    losses, _ = loss_fn(variables, batch, jnp.asarray(50, jnp.int32))
    for k in ('loss_cls', 'loss_bbox', 'loss_centerness', 'loss_prj',
              'loss_pairwise'):
        v = np.asarray(losses[k])
        assert np.isfinite(v), f'{k} not finite: {v}'
        assert v >= 0, f'{k} negative: {v}'


def test_loss_grads_finite(model_and_vars):
    model, variables, _, _ = model_and_vars
    batch = synthetic_batch(np.random.RandomState(2))
    params = variables['params']
    rest = {k: v for k, v in variables.items() if k != 'params'}

    def total_loss(p):
        losses, _ = model.apply({'params': p, **rest}, batch,
                                jnp.asarray(200, jnp.int32),
                                method=model.loss, mutable=['batch_stats'])
        return sum(v for k, v in losses.items() if 'loss' in k)

    loss, grads = jax.jit(jax.value_and_grad(total_loss))(params)
    assert np.isfinite(np.asarray(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # frozen stage must receive zero grads (stop_gradient)
    g_stem = grads['backbone_m']['conv1']['kernel']
    assert np.all(np.asarray(g_stem) == 0)
    # mask param conv must receive nonzero grads through the dynamic decode
    g_param = grads['bbox_head_m']['param_conv']['kernel']
    assert np.any(np.asarray(g_param) != 0)


def test_pairwise_warmup_scales_loss(model_and_vars):
    model, variables, loss_fn, _ = model_and_vars
    batch = synthetic_batch(np.random.RandomState(3))
    l0, _ = loss_fn(variables, batch, jnp.asarray(0, jnp.int32))
    l1, _ = loss_fn(variables, batch, jnp.asarray(1000, jnp.int32))
    assert float(l0['loss_pairwise']) == pytest.approx(0.0)
    assert float(l1['loss_pairwise']) > 0


def test_predict_shapes(model_and_vars):
    model, variables, _, predict_fn = model_and_vars
    batch = synthetic_batch(np.random.RandomState(4))
    out = predict_fn(variables, batch)
    d = out['bboxes'].shape[1]
    assert out['scores'].shape == (2, d)
    assert out['labels'].shape == (2, d)
    assert out['masks'].shape == (2, d, H // 4, W // 4)
    assert np.all(np.asarray(out['masks']) >= 0)
    assert np.all(np.asarray(out['masks']) <= 1)
    # valid detections have boxes inside the image
    b = np.asarray(out['bboxes'])
    v = np.asarray(out['valid'])
    assert np.all(b[v][:, 0] >= 0) and np.all(b[v][:, 2] <= W)
