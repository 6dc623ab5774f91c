"""Hook-zoo and LR-schedule completions: momentum-scheduled EMA,
SetEpochInfo, YOLOX mode switch (skip-type keys), cosine/yolox LR."""
import math

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402


def test_momentum_ema_schedules():
    from boxinstseg_tpu.engine.hooks import (EMAHook, ExpMomentumEMAHook,
                                             LinearMomentumEMAHook)
    exp = ExpMomentumEMAHook(momentum=0.0002, total_iter=100)
    # reference formula ema.py:55-56
    for t in (0, 10, 99):
        want = (1 - 0.0002) * math.exp(-(1 + t) / 100) + 0.0002
        assert abs((1.0 - exp._keep_rate(t)) - want) < 1e-12
    lin = LinearMomentumEMAHook(momentum=0.0002, warm_up=100)
    for t in (0, 10, 1000000):
        want = min(0.0002, (1 + t) / (100 + t))
        assert abs((1.0 - lin._keep_rate(t)) - want) < 1e-12

    class S:  # minimal state
        params = {'w': jnp.ones((2,))}

    h = EMAHook(momentum=0.9)
    h.after_step(0, S(), {})
    S2 = S()
    S2.params = {'w': jnp.zeros((2,))}
    h.after_step(1, S2, {})
    np.testing.assert_allclose(np.asarray(h.ema_params['w']), 0.9)


def test_cosine_and_yolox_lr():
    from boxinstseg_tpu.engine.schedules import build_lr_schedule
    sched = build_lr_schedule(
        dict(policy='CosineAnnealing', min_lr_ratio=0.05, warmup='linear',
             warmup_iters=10, warmup_ratio=0.1),
        base_lr=1.0, iters_per_epoch=10, by_epoch=False, max_iters=100)
    # warmup start: base * warmup_ratio
    np.testing.assert_allclose(float(sched(0)), 0.1, rtol=1e-5)
    # end of cosine: min_lr
    np.testing.assert_allclose(float(sched(100)), 0.05, rtol=1e-5)
    # midpoint of cosine: (base+min)/2
    np.testing.assert_allclose(float(sched(50)), (1 + 0.05) / 2, rtol=1e-4)

    ys = build_lr_schedule(
        dict(policy='YOLOX', min_lr_ratio=0.05, num_last_epochs=2,
             warmup='exp', warmup_iters=10),
        base_lr=1.0, iters_per_epoch=10, by_epoch=False, max_iters=100)
    # quadratic warmup
    np.testing.assert_allclose(float(ys(5)), 0.25, rtol=1e-5)
    # frozen tail at min_lr
    np.testing.assert_allclose(float(ys(85)), 0.05, rtol=1e-5)
    np.testing.assert_allclose(float(ys(99)), 0.05, rtol=1e-5)
    # monotone decay in the cosine span
    vals = [float(ys(t)) for t in range(10, 80, 5)]
    assert all(a >= b - 1e-7 for a, b in zip(vals, vals[1:]))


def test_yolox_mode_switch_and_skip_keys():
    from boxinstseg_tpu.data.coco import MultiImageMixDataset
    from boxinstseg_tpu.engine.hooks import (SetEpochInfoHook,
                                             YOLOXModeSwitchHook)

    class FakeDS:
        CLASSES = ('a',)
        flag = np.zeros(4, np.uint8)

        def __len__(self):
            return 4

        def prepare(self, idx, rng=None, scale=None):
            return {'x': idx}

    class MarkA:
        def __call__(self, r):
            r['a'] = True
            return r

    ds = MultiImageMixDataset(FakeDS(), [dict(type='RandomFlip',
                                              flip_ratio=0.0), MarkA()])
    n0 = len(ds.pipeline.transforms)
    ds.update_skip_type_keys(('RandomFlip',))
    assert len(ds.pipeline.transforms) == n0 - 1
    out = ds[1]
    assert out['a'] and out['x'] == 1

    class Head:
        use_l1 = False

    class Model:
        bbox_head = Head()
        epoch = None

        def set_epoch(self, e):
            self.epoch = e

    m = Model()
    ds2 = MultiImageMixDataset(FakeDS(), [dict(type='RandomFlip',
                                               flip_ratio=0.0)])
    hook = YOLOXModeSwitchHook(num_last_epochs=2, model=m, dataset=ds2,
                               max_epochs=10,
                               skip_type_keys=('RandomFlip',))
    hook.after_epoch(5, None)     # not the trigger epoch
    assert not m.bbox_head.use_l1
    hook.after_epoch(7, None)     # (7+2) == 10 - 2 + 1 -> trigger
    assert m.bbox_head.use_l1
    assert len(ds2.pipeline.transforms) == 0

    se = SetEpochInfoHook(m)
    se.after_epoch(3, None)
    assert m.epoch == 4
