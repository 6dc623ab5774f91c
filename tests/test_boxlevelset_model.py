"""End-to-end BoxLevelset (BoxSOLOv2Head) tests on tiny synthetic data."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from boxinstseg_tpu.registry import build_detector

H, W = 128, 128
NUM_CLASSES = 4
MAX_GT = 4


def tiny_cfg():
    return dict(
        type='BoxLevelSet',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=0, num_outs=5),
        bbox_head=dict(
            type='BoxSOLOv2Head', num_classes=NUM_CLASSES, in_channels=32,
            seg_feat_channels=16, stacked_convs=1,
            strides=[8, 8, 16, 32, 32],
            scale_ranges=((1, 48), (24, 96), (48, 192), (96, 384),
                          (192, 2048)),
            sigma=0.2, num_grids=[12, 10, 8, 6, 4], cate_down_pos=0,
            loss_boxpro=dict(type='BoxProjectionLoss', loss_weight=3.0),
            max_pos=8, tf_size=(24, 24), tf_max_depth=64),
        test_cfg=dict(nms_pre=50, score_thr=0.05, mask_thr=0.55,
                      filter_thr=0.025, kernel='gaussian', sigma=2.0,
                      max_per_img=10),
    )


def synth_batch(rng, b=2):
    img = rng.rand(b, H, W, 3).astype(np.float32) * 4 - 2
    boxes = np.zeros((b, MAX_GT, 4), np.float32)
    valid = np.zeros((b, MAX_GT), bool)
    labels = np.zeros((b, MAX_GT), np.int32)
    masks = np.zeros((b, MAX_GT, H // 4, W // 4), np.uint8)
    for i in range(b):
        n = rng.randint(1, MAX_GT + 1)
        for g in range(n):
            x1 = rng.randint(0, W - 48)
            y1 = rng.randint(0, H - 48)
            x2 = x1 + rng.randint(24, 48)
            y2 = y1 + rng.randint(24, 48)
            boxes[i, g] = [x1, y1, x2, y2]
            labels[i, g] = rng.randint(0, NUM_CLASSES)
            valid[i, g] = True
            masks[i, g, y1 // 4:y2 // 4 + 1, x1 // 4:x2 // 4 + 1] = 1
    return {
        'image': jnp.asarray(img),
        'img_shape': jnp.asarray([[H, W]] * b, np.int32),
        'gt_bboxes': jnp.asarray(boxes),
        'gt_labels': jnp.asarray(labels),
        'gt_valid': jnp.asarray(valid),
        'gt_masks': jnp.asarray(masks),
        'scale_factor': jnp.ones((b, 4), np.float32),
    }


@pytest.fixture(scope='module')
def setup():
    model = build_detector(tiny_cfg())
    batch = synth_batch(np.random.RandomState(0))
    from boxinstseg_tpu.engine import init_variables
    variables = init_variables(model, {'params': jax.random.PRNGKey(0)},
                               batch, jnp.zeros((), jnp.int32),
                               method=model.loss)

    @jax.jit
    def loss_fn(v, b):
        return model.apply(v, b, jnp.zeros((), jnp.int32),
                           method=model.loss)

    @jax.jit
    def predict_fn(v, b):
        return model.apply(v, b, method=model.predict)

    return model, variables, loss_fn, predict_fn


def test_losses_finite(setup):
    model, variables, loss_fn, _ = setup
    losses = loss_fn(variables, synth_batch(np.random.RandomState(1)))
    for k in ('loss_cate', 'loss_boxpro', 'loss_levelset'):
        v = float(losses[k])
        assert np.isfinite(v), f'{k}={v}'
    assert float(losses['loss_boxpro']) > 0


def test_grads_flow_to_levelset_head(setup):
    model, variables, _, _ = setup
    batch = synth_batch(np.random.RandomState(2))

    rest = {k: v for k, v in variables.items() if k != 'params'}

    def total(p):
        losses = model.apply({'params': p, **rest}, batch,
                             jnp.zeros((), jnp.int32), method=model.loss)
        return sum(losses.values())

    grads = jax.jit(jax.grad(total))(variables['params'])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # the 5-ch levelset head must receive gradient through the tree
    # filter's edge weights (the reference trains it the same way)
    g_lvl = grads['bbox_head_m']['levelset_bottom']['kernel']
    assert np.any(np.asarray(g_lvl) != 0), \
        'levelset_bottom got no gradient - tree filter edge grads broken'
    g_kernel = grads['bbox_head_m']['solo_kernel']['kernel']
    assert np.any(np.asarray(g_kernel) != 0)


def test_predict_shapes(setup):
    model, variables, _, predict_fn = setup
    out = predict_fn(variables, synth_batch(np.random.RandomState(3)))
    d = out['scores'].shape[1]
    assert out['labels'].shape == (2, d)
    assert out['masks'].shape == (2, d, H // 4, W // 4)
    s = np.asarray(out['scores'])
    v = np.asarray(out['valid'])
    assert np.all(s[~v] == 0)
