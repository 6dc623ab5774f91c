"""End-to-end Box2Mask tests: transformer head, Hungarian matching,
deep-supervised losses, instance post-processing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from boxinstseg_tpu.registry import build_detector

H, W = 128, 128
NUM_CLASSES = 4
MAX_GT = 4
Q = 10


def tiny_cfg():
    return dict(
        type='Box2Mask',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=-1),
        panoptic_head=dict(
            type='Box2MaskHead',
            in_channels=[64, 128, 256, 512],
            strides=[4, 8, 16, 32],
            feat_channels=32,
            out_channels=32,
            num_things_classes=NUM_CLASSES,
            num_stuff_classes=0,
            num_queries=Q,
            num_transformer_feat_level=3,
            pixel_decoder=dict(num_outs=3, num_encoder_layers=2),
            transformer_decoder=dict(
                num_layers=3,
                transformerlayers=dict(
                    attn_cfgs=dict(num_heads=4),
                    feedforward_channels=64)),
            loss_cls=dict(type='CrossEntropyLoss', loss_weight=2.0,
                          class_weight=[1.0] * NUM_CLASSES + [0.1]),
            loss_box=dict(type='BoxProjectionLoss', loss_weight=5.0),
            loss_mask=dict(type='LevelsetLoss', loss_weight=1.0),
            max_matched=MAX_GT,
            tf_size=(24, 24),
            tf_max_depth=64),
        train_cfg=dict(
            assigner=dict(type='MaskHungarianAssigner',
                          cls_cost=dict(type='ClassificationCost',
                                        weight=2.0),
                          dice_cost=dict(type='BoxMatchingCost', weight=5.0,
                                         pred_act=True, eps=1.0)),
            sampler=dict(type='MaskPseudoSampler')),
        test_cfg=dict(panoptic_on=False, semantic_on=False,
                      instance_on=True, max_per_image=10),
    )


def synth_batch(rng, b=2):
    from test_boxlevelset_model import synth_batch as sb
    return sb(rng, b)


@pytest.fixture(scope='module')
def setup():
    model = build_detector(tiny_cfg())
    batch = synth_batch(np.random.RandomState(0))
    from boxinstseg_tpu.engine import init_variables
    variables = init_variables(model, {'params': jax.random.PRNGKey(0)},
                               batch, jnp.zeros((), jnp.int32),
                               method=model.loss)
    return model, variables, batch


def test_deep_supervised_losses(setup):
    model, variables, batch = setup
    losses = jax.jit(lambda v, b: model.apply(
        v, b, jnp.zeros((), jnp.int32), method=model.loss))(variables, batch)
    # 4 head applications (3 layers + initial) x 3 loss terms
    assert 'loss_cls' in losses and 'd0.loss_cls' in losses
    assert 'd2.loss_levelset' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k}={float(v)}'


def test_grads_reach_queries_and_levelset(setup):
    model, variables, batch = setup
    rest = {k: v for k, v in variables.items() if k != 'params'}

    def total(p):
        losses = model.apply({'params': p, **rest}, batch,
                             jnp.zeros((), jnp.int32), method=model.loss)
        return sum(losses.values())

    grads = jax.jit(jax.grad(total))(variables['params'])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    h = grads['panoptic_head_m']
    assert np.any(np.asarray(h['query_feat']) != 0)
    assert np.any(np.asarray(h['cls_embed']['kernel']) != 0)
    assert np.any(np.asarray(h['levelset_bottom']['kernel']) != 0)
    assert np.any(np.asarray(
        h['pixel_decoder']['encoder_layer_0']['attn']['value_proj'][
            'kernel']) != 0)


def test_hungarian_matching_sanity():
    from boxinstseg_tpu.core.targets.hungarian import hungarian_match
    # 3 queries, 2 gts; cost favors q2->g0, q0->g1
    cost = jnp.asarray([[[5.0, 0.1], [9.0, 9.0], [0.2, 8.0]]])
    valid = jnp.asarray([[True, True]])
    assigned, v = hungarian_match(cost, valid)
    assert v.all()
    assert int(assigned[0, 0]) == 2
    assert int(assigned[0, 1]) == 0
    # padded gt slots must come back invalid
    valid2 = jnp.asarray([[True, False]])
    a2, v2 = hungarian_match(cost, valid2)
    assert bool(v2[0, 0]) and not bool(v2[0, 1])
    assert int(a2[0, 0]) == 2


def test_instance_postprocess_shapes(setup):
    model, variables, batch = setup
    out = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))(
        variables, batch)
    d = out['scores'].shape[1]
    # device half returns raw cls scores + mask LOGITS; binarization and
    # rescoring happen at ori-res on the host (format_detection), like
    # the reference fusion head
    assert out['masks_logit'].shape == (2, d, H // 4, W // 4)
    s = np.asarray(out['scores'])
    assert np.all(s >= 0) and np.all(s <= 1)

    from boxinstseg_tpu.apis.test import format_detection
    res = format_detection(
        jax.tree_util.tree_map(np.asarray, out), 0, (H, W), (H, W), {})
    assert len(res.bboxes) == len(res.masks) == len(res.labels)
    for m in res.masks:
        assert m.shape == (H, W) and m.any()
    # host rescoring multiplies in the mean-sigmoid-over-mask factor
    assert np.all(res.bboxes[:, 4] >= 0) and np.all(res.bboxes[:, 4] <= 1)


def test_panoptic_on_predict_path(setup):
    """With test_cfg.panoptic_on, predict carries the raw per-query
    outputs and format_detection emits a pan_results map (reference
    maskformer_fusion_head.py simple_test :201-226 + panoptic
    postprocess :28-93)."""
    model, variables, batch = setup
    cfg = tiny_cfg()
    cfg['test_cfg'] = dict(cfg['test_cfg'], panoptic_on=True)
    pan_model = build_detector(cfg)
    out = jax.jit(lambda v, b: pan_model.apply(
        v, b, method=pan_model.predict))(variables, batch)
    assert out['pan_cls'].shape == (2, Q, NUM_CLASSES + 1)
    assert out['pan_masks_logit'].shape == (2, Q, H // 4, W // 4)

    from boxinstseg_tpu.apis.test import format_detection
    test_cfg = dict(panoptic_on=True, object_mask_thr=0.0, iou_thr=0.0,
                    panoptic_fusion=dict(num_things_classes=NUM_CLASSES,
                                         num_stuff_classes=0))
    res = format_detection(jax.tree_util.tree_map(np.asarray, out), 0,
                           (H, W), (H, W), test_cfg)
    pan = res.metainfo['pan_results']
    assert pan.shape == (H, W) and pan.dtype == np.int32
    # every value is void (num_classes) or label + k*INSTANCE_OFFSET
    labs = np.unique(pan) % 1000
    assert np.all((labs <= NUM_CLASSES))


def test_swin_backbone_shapes():
    from boxinstseg_tpu.models.backbones.swin import SwinTransformer
    model = SwinTransformer(embed_dims=32, depths=(1, 1, 2, 1),
                            num_heads=(1, 2, 4, 8), window_size=7)
    x = jnp.zeros((1, 96, 128, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(model.apply)(variables, x)
    assert len(feats) == 4
    assert feats[0].shape == (1, 24, 32, 32)
    assert feats[1].shape == (1, 12, 16, 64)
    assert feats[2].shape == (1, 6, 8, 128)
    assert feats[3].shape == (1, 3, 4, 256)
    assert all(np.all(np.isfinite(np.asarray(f))) for f in feats)
