"""Golden tests: TTA merge helpers vs the reference torch code, and the
ResNetV1d deep-stem/avg-down math vs a hand-built torch oracle."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from ref_oracle import load_ref, ref_available  # noqa: E402

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason='reference tree not mounted')

TRANS = 'mmdet/core/bbox/transforms.py'
MERGE = 'mmdet/core/post_processing/merge_augs.py'


def _metas():
    return [
        dict(img_shape=(100, 150, 3), scale_factor=np.array(
            [1.5, 1.5, 1.5, 1.5], np.float32), flip=False,
            flip_direction='horizontal'),
        dict(img_shape=(100, 150, 3), scale_factor=np.array(
            [1.5, 1.5, 1.5, 1.5], np.float32), flip=True,
            flip_direction='horizontal'),
        dict(img_shape=(100, 150, 3), scale_factor=np.array(
            [1.5, 1.5, 1.5, 1.5], np.float32), flip=True,
            flip_direction='diagonal'),
    ]


def test_golden_bbox_mapping_and_merge_bboxes():
    from boxinstseg_tpu.ops import bbox_mapping, merge_aug_bboxes
    ns = load_ref(TRANS, ['bbox_flip', 'bbox_mapping',
                          'bbox_mapping_back'])
    merge_ns = load_ref(
        MERGE, ['merge_aug_bboxes', 'merge_aug_scores'],
        extra_ns={'bbox_mapping_back': ns['bbox_mapping_back']})
    rng = np.random.default_rng(0)
    metas = _metas()
    aug_boxes, aug_scores = [], []
    for _ in metas:
        xy = rng.uniform(0, 60, (6, 2)).astype(np.float32)
        wh = rng.uniform(5, 30, (6, 2)).astype(np.float32)
        aug_boxes.append(np.concatenate([xy, xy + wh], 1))
        aug_scores.append(rng.random((6, 4)).astype(np.float32))

    # mapping roundtrip parity per-meta
    for b, m in zip(aug_boxes, metas):
        want = ns['bbox_mapping'](torch.from_numpy(b), m['img_shape'],
                                  torch.from_numpy(m['scale_factor']),
                                  m['flip'], m['flip_direction'])
        got = bbox_mapping(jnp.asarray(b), m['img_shape'],
                           jnp.asarray(m['scale_factor']), m['flip'],
                           m['flip_direction'])
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-6)

    want_b, want_s = merge_ns['merge_aug_bboxes'](
        [torch.from_numpy(b) for b in aug_boxes],
        [torch.from_numpy(s) for s in aug_scores],
        [[m] for m in metas], None)
    got_b, got_s = merge_aug_bboxes(
        [jnp.asarray(b) for b in aug_boxes],
        [jnp.asarray(s) for s in aug_scores], [[m] for m in metas])
    np.testing.assert_allclose(np.asarray(got_b), want_b.numpy(),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), want_s.numpy(),
                               rtol=1e-6)


def test_golden_merge_masks_and_proposals():
    from boxinstseg_tpu.ops import merge_aug_masks, merge_aug_proposals
    ns = load_ref(MERGE, ['merge_aug_masks'])
    rng = np.random.default_rng(1)
    metas = _metas()
    masks = [rng.random((3, 2, 8, 9)).astype(np.float32) for _ in metas]
    want = ns['merge_aug_masks'](list(masks), [[m] for m in metas], None,
                                 weights=[1.0, 2.0, 0.5])
    got = merge_aug_masks(masks, [[m] for m in metas],
                          weights=[1.0, 2.0, 0.5])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    # proposals: scores survive, boxes deduplicated by NMS
    props = []
    for m in metas:
        xy = rng.uniform(0, 60, (5, 2)).astype(np.float32)
        wh = rng.uniform(10, 30, (5, 2)).astype(np.float32)
        s = rng.random((5, 1)).astype(np.float32)
        props.append(jnp.asarray(np.concatenate([xy, xy + wh, s], 1)))
    merged = merge_aug_proposals(props, metas,
                                 dict(nms=dict(iou_threshold=0.5),
                                      max_per_img=8))
    assert merged.shape == (8, 5)
    s = np.asarray(merged[:, 4])
    assert (np.diff(s[s > 0]) <= 1e-6).all()   # score-sorted


def test_resnet_v1d_block_oracle():
    import flax

    from boxinstseg_tpu.models.backbones.resnet import (Bottleneck,
                                                        ResNetV1d)
    torch.manual_seed(0)
    x = torch.rand(1, 16, 9, 11)          # odd dims exercise ceil_mode
    conv1 = tnn.Conv2d(16, 8, 1, bias=False)
    conv2 = tnn.Conv2d(8, 8, 3, 2, 1, bias=False)
    conv3 = tnn.Conv2d(8, 32, 1, bias=False)
    down = tnn.Sequential(
        tnn.AvgPool2d(2, 2, ceil_mode=True, count_include_pad=False),
        tnn.Conv2d(16, 32, 1, 1, bias=False))
    out = TF.relu(conv1(x))
    out = TF.relu(conv2(out))
    out = conv3(out)
    want = TF.relu(out + down(x)).detach().numpy()

    blk = Bottleneck(planes=8, stride=2, has_downsample=True,
                     avg_down=True)
    xin = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    v = blk.init(jax.random.PRNGKey(0), xin)
    p = flax.core.unfreeze(v)['params']

    def cw(t):
        return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))

    p['conv1']['kernel'] = cw(conv1.weight)
    p['conv2']['kernel'] = cw(conv2.weight)
    p['conv3']['kernel'] = cw(conv3.weight)
    p['downsample_conv']['kernel'] = cw(down[1].weight)
    rest = {k: vv for k, vv in v.items() if k != 'params'}
    got = blk.apply({'params': p, **rest}, xin)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want, rtol=1e-4, atol=1e-5)

    m = ResNetV1d(depth=50, out_indices=(0, 1, 2, 3))
    xs = jnp.ones((1, 64, 96, 3))
    outs = m.apply(m.init(jax.random.PRNGKey(0), xs), xs)
    assert outs[0].shape == (1, 16, 24, 256)
    assert outs[3].shape == (1, 2, 3, 2048)
    # deep stem params present, 7x7 conv absent
    vv = m.init(jax.random.PRNGKey(0), xs)
    names = set(vv['params'].keys())
    assert 'stem_conv0' in names and 'conv1' not in names
