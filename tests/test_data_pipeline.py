"""Pipeline transform + static batcher semantics."""
import numpy as np
import pytest

from boxinstseg_tpu.data.pipelines import (Compose, GenerateBoxMask,
                                           Normalize, Pad, RandomCrop,
                                           RandomFlip, Resize)
from boxinstseg_tpu.data.batcher import (GroupedBatchSampler,
                                         StaticBatcher)


def sample(rng, h=300, w=400, n=3):
    img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    boxes = []
    for _ in range(n):
        x1 = rng.randint(0, w - 50)
        y1 = rng.randint(0, h - 50)
        boxes.append([x1, y1, x1 + rng.randint(10, 50),
                      y1 + rng.randint(10, 50)])
    return dict(img=img, img_shape=img.shape, ori_shape=img.shape,
                gt_bboxes=np.asarray(boxes, np.float32),
                gt_labels=np.arange(n, dtype=np.int64),
                bbox_fields=['gt_bboxes'], mask_fields=[],
                rng=rng)


def test_resize_keep_ratio_and_boxes(rng):
    res = Resize(img_scale=(1333, 800), keep_ratio=True)(sample(rng))
    h, w = res['img'].shape[:2]
    assert max(h, w) <= 1333 and min(h, w) <= 800
    # aspect preserved within rounding
    assert abs(w / h - 400 / 300) < 0.02
    assert np.all(res['gt_bboxes'][:, 2] <= w + 1e-3)


def test_multiscale_value_picks_from_list(rng):
    scales = [(1333, 800), (1333, 640)]
    seen = set()
    for seed in range(20):
        r = Resize(img_scale=scales, multiscale_mode='value',
                   keep_ratio=True)(sample(np.random.RandomState(seed)))
        seen.add(min(r['img'].shape[:2]) // 100)
    assert len(seen) > 1   # both scales get sampled


def test_flip_boxes(rng):
    s = sample(rng)
    boxes_before = s['gt_bboxes'].copy()
    w = s['img'].shape[1]
    f = RandomFlip(flip_ratio=1.0)(s)
    assert f['flip'] is True
    np.testing.assert_allclose(f['gt_bboxes'][:, 0], w - boxes_before[:, 2])
    np.testing.assert_allclose(f['gt_bboxes'][:, 2], w - boxes_before[:, 0])


def test_generate_box_mask_matches_boxes(rng):
    s = sample(rng)
    out = GenerateBoxMask()(s)
    assert len(out['gt_masks']) == len(out['gt_bboxes'])
    for m, b in zip(out['gt_masks'], out['gt_bboxes']):
        ys, xs = np.nonzero(m)
        assert ys.min() == int(b[1]) and xs.min() == int(b[0])
        assert ys.max() == int(b[3]) and xs.max() == int(b[2])


def test_pad_and_normalize(rng):
    s = sample(rng)
    s = Normalize(mean=[123.675, 116.28, 103.53],
                  std=[58.395, 57.12, 57.375], to_rgb=True)(s)
    s = Pad(size_divisor=32)(s)
    h, w = s['img'].shape[:2]
    assert h % 32 == 0 and w % 32 == 0
    assert s['img'].dtype == np.float32


def test_random_crop_keeps_valid_boxes(rng):
    s = sample(rng, h=400, w=400, n=5)
    out = RandomCrop(crop_size=(200, 200), crop_type='absolute',
                     allow_negative_crop=True)(s)
    assert out['img'].shape[:2] == (200, 200)
    if len(out['gt_bboxes']):
        assert np.all(out['gt_bboxes'][:, 2] <= 200)
        assert np.all(out['gt_bboxes'][:, 2] > out['gt_bboxes'][:, 0])


def test_static_batcher_shapes_and_meta(rng):
    batcher = StaticBatcher(canvases=[(320, 480), (480, 320)], max_gts=8,
                            bottom_pixels_removed=10)
    samples = []
    for _ in range(2):
        s = sample(rng, h=300, w=400)
        s['scale_factor'] = np.ones(4, np.float32)
        s['img'] = s['img'].astype(np.float32)
        samples.append(s)
    batch = batcher(samples)
    assert batch['image'].shape == (2, 320, 480, 3)
    assert batch['gt_bboxes'].shape == (2, 8, 4)
    assert batch['gt_valid'].sum() == 6
    # pixels_removed = int(10 * img_h / ori_h) = 10 here (no resize)
    assert np.all(batch['pixels_removed'] == 10)
    # padding region zeroed
    assert np.all(batch['image'][:, 300:, :, :] == 0)


def test_grouped_sampler_single_group_batches():
    flags = np.array([0, 0, 0, 1, 1, 1, 1, 0])
    sampler = GroupedBatchSampler(flags, batch_size=3, seed=0)
    it = iter(sampler)
    for _ in range(10):
        idx = next(it)
        assert len(set(flags[i] for i in idx)) == 1


def test_default_canvases_buckets_multiscale():
    """Multiscale-'value' recipes get <=3 short-side canvas buckets
    (VERDICT r1 item 7); single-scale and LSJ recipes keep the fixed
    canvas pair."""
    from boxinstseg_tpu.apis.train import (batch_scale_choices,
                                           default_canvases)

    class C(dict):
        def get(self, k, d=None):
            return dict.get(self, k, d)

    scales = [(1333, 800), (1333, 768), (1333, 736),
              (1333, 704), (1333, 672), (1333, 640)]
    cfg = C(data=dict(train=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='Resize', img_scale=scales, multiscale_mode='value',
             keep_ratio=True)])))
    canv = default_canvases(cfg)
    assert (672, 1344) in canv and (736, 1344) in canv \
        and (800, 1344) in canv
    assert (1344, 672) in canv and len(canv) == 6
    assert batch_scale_choices(cfg) == [tuple(s) for s in scales]

    single = C(data=dict(train=dict(pipeline=[
        dict(type='Resize', img_scale=(1333, 800), keep_ratio=True)])))
    assert default_canvases(single) == [(800, 1344), (1344, 800)]
    assert batch_scale_choices(single) is None

    lsj = C(data=dict(train=dict(pipeline=[
        dict(type='Resize', img_scale=(1024, 1024),
             ratio_range=(0.1, 2.0), keep_ratio=True)])))
    assert default_canvases(lsj) == [(800, 1344), (1344, 800)]
    assert batch_scale_choices(lsj) is None


def test_loader_batch_scale_lands_on_small_canvas(rng):
    """With batch_scales, every image in a batch shares one multiscale
    choice and a 640/672-short-side batch lands on the 672 canvas."""
    from boxinstseg_tpu.data.loader import TrainLoader

    class TinyDS:
        flag = np.zeros(8, np.int64)

        def __len__(self):
            return 8

        def prepare(self, idx, rng=None, scale=None):
            assert scale is not None
            r = Resize(img_scale=[(1333, 800)], multiscale_mode='value',
                       keep_ratio=True)
            s = sample(np.random.RandomState(idx), h=600, w=1000)
            s['scale'] = tuple(scale)
            return r(s)

    batcher = StaticBatcher(
        canvases=[(672, 1344), (1344, 672), (736, 1344), (1344, 736),
                  (800, 1344), (1344, 800)], max_gts=8)
    scales = [(1333, 800), (1333, 736), (1333, 672), (1333, 640)]
    loader = TrainLoader(TinyDS(), 4, batcher, num_workers=2, seed=3,
                         batch_scales=scales)
    seen = set()
    for i, batch in enumerate(loader):
        seen.add(tuple(batch['image'].shape[1:3]))
        if i >= 7:
            break
    assert seen <= {(672, 1344), (736, 1344), (800, 1344)}
    assert len(seen) > 1    # several buckets actually hit


def test_static_batcher_gt_buckets():
    """GT width = smallest bucket >= the batch's live max; every live
    instance still fits (zero math change, less padding)."""
    import numpy as np
    from boxinstseg_tpu.data.batcher import StaticBatcher

    batcher = StaticBatcher(canvases=[(64, 64)], max_gts=100,
                            gt_buckets=(8, 16, 32))

    def sample(n):
        return dict(img=np.zeros((60, 60, 3), np.float32),
                    ori_shape=(60, 60, 3),
                    gt_bboxes=np.tile([1., 1., 9., 9.], (n, 1)),
                    gt_labels=np.zeros(n, np.int64))

    for lives, want in [((3, 5), 8), ((9,), 16), ((17, 2), 32),
                        ((40,), 100)]:
        out = batcher([sample(n) for n in lives])
        assert out['gt_labels'].shape[1] == want, (lives, want)
        for i, n in enumerate(lives):
            assert out['gt_valid'][i, :n].all()
            assert not out['gt_valid'][i, n:].any()


def test_static_batcher_default_single_bucket():
    import numpy as np
    from boxinstseg_tpu.data.batcher import StaticBatcher

    batcher = StaticBatcher(canvases=[(64, 64)], max_gts=25)
    out = batcher([dict(img=np.zeros((60, 60, 3), np.float32),
                        ori_shape=(60, 60, 3),
                        gt_bboxes=np.tile([1., 1., 9., 9.], (2, 1)),
                        gt_labels=np.zeros(2, np.int64))])
    assert out['gt_labels'].shape[1] == 25
