"""Golden tests: the anchor generator family vs the reference's own
torch AnchorGenerator classes (AST-extracted)."""
import numpy as np
import pytest
import torch

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from ref_oracle import load_ref, ref_available  # noqa: E402

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason='reference tree not mounted')

ANCH = 'mmdet/core/anchor/anchor_generator.py'


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class _FakeMMCVMod:
    @staticmethod
    def is_tuple_of(x, t):
        return isinstance(x, tuple) and all(isinstance(v, t) for v in x)

    @staticmethod
    def jit(*a, **k):
        def deco(f):
            return f
        return deco


class _FakeReg:
    def register_module(self, *a, **k):
        def deco(obj):
            return obj
        return deco


def _load(names):
    return load_ref(ANCH, names,
                    extra_ns={'_pair': _pair, 'mmcv': _FakeMMCVMod(),
                              'PRIOR_GENERATORS': _FakeReg()})


def test_golden_anchor_generator():
    from boxinstseg_tpu.ops import AnchorGenerator
    Ref = _load(['AnchorGenerator'])['AnchorGenerator']
    for kwargs in (
            dict(strides=[8, 16, 32], ratios=[0.5, 1.0, 2.0],
                 octave_base_scale=4, scales_per_octave=3),
            dict(strides=[4, 8], ratios=[1.0, 2.5], scales=[2, 4],
                 base_sizes=[6, 12], center_offset=0.5),
            dict(strides=[(8, 4)], ratios=[1.0], scales=[1.5],
                 scale_major=False),
    ):
        ref = Ref(**kwargs)
        ours = AnchorGenerator(**kwargs)
        sizes = [(10, 14), (5, 7), (3, 4)][:ref.num_levels]
        ra = ref.grid_priors(sizes, device='cpu')
        oa = ours.grid_priors(sizes)
        assert ours.num_base_priors == ref.num_base_priors
        for r, o in zip(ra, oa):
            np.testing.assert_allclose(o, r.numpy(), rtol=1e-6, atol=1e-5)
        rf = ref.valid_flags(sizes, (70, 100), device='cpu')
        of = ours.valid_flags(sizes, (70, 100))
        for r, o in zip(rf, of):
            np.testing.assert_array_equal(o, r.numpy())


def test_golden_sparse_priors():
    from boxinstseg_tpu.ops import AnchorGenerator
    Ref = _load(['AnchorGenerator'])['AnchorGenerator']
    kwargs = dict(strides=[8, 16], ratios=[0.5, 1.0, 2.0],
                  scales=[1, 2])
    ref = Ref(**kwargs)
    ours = AnchorGenerator(**kwargs)
    idxs = np.array([0, 5, 17, 41, 59], np.int32)
    r = ref.sparse_priors(torch.from_numpy(idxs.astype(np.int64)),
                          (6, 8), 1, device='cpu')
    o = ours.sparse_priors(jnp.asarray(idxs), (6, 8), 1)
    np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-6,
                               atol=1e-5)


def test_golden_ssd_anchor_generator():
    from boxinstseg_tpu.ops import SSDAnchorGenerator
    ns = _load(['AnchorGenerator', 'SSDAnchorGenerator'])
    kwargs = dict(strides=[8, 16, 32, 64, 100, 300],
                  ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
                  basesize_ratio_range=(0.15, 0.9), input_size=300)
    ref = ns['SSDAnchorGenerator'](**kwargs)
    ours = SSDAnchorGenerator(**kwargs)
    assert ours.num_base_priors == ref.num_base_priors
    for r, o in zip(ref.base_anchors, ours.base_anchors):
        np.testing.assert_allclose(o, r.numpy(), rtol=1e-5, atol=1e-4)
    sizes = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    for r, o in zip(ref.grid_priors(sizes, device='cpu'),
                    ours.grid_priors(sizes)):
        np.testing.assert_allclose(o, r.numpy(), rtol=1e-5, atol=1e-4)


def test_golden_legacy_anchor_generator():
    from boxinstseg_tpu.ops import LegacyAnchorGenerator
    ns = _load(['AnchorGenerator', 'LegacyAnchorGenerator'])
    kwargs = dict(strides=[16], ratios=[0.5, 1.0, 2.0],
                  scales=[8, 16, 32], center_offset=0.5)
    ref = ns['LegacyAnchorGenerator'](**kwargs)
    ours = LegacyAnchorGenerator(**kwargs)
    for r, o in zip(ref.grid_priors([(7, 9)], device='cpu'),
                    ours.grid_priors([(7, 9)])):
        np.testing.assert_allclose(o, r.numpy(), rtol=1e-6, atol=1e-5)


def test_golden_yolo_anchor_generator():
    from boxinstseg_tpu.ops import YOLOAnchorGenerator
    ns = _load(['AnchorGenerator', 'YOLOAnchorGenerator'])
    kwargs = dict(strides=[32, 16, 8],
                  base_sizes=[[(116, 90), (156, 198), (373, 326)],
                              [(30, 61), (62, 45), (59, 119)],
                              [(10, 13), (16, 30), (33, 23)]])
    ref = ns['YOLOAnchorGenerator'](**kwargs)
    ours = YOLOAnchorGenerator(**kwargs)
    sizes = [(5, 6), (10, 12), (20, 24)]
    for r, o in zip(ref.grid_priors(sizes, device='cpu'),
                    ours.grid_priors(sizes)):
        np.testing.assert_allclose(o, r.numpy(), rtol=1e-6, atol=1e-5)

    gt = np.array([[10., 20., 60., 80.], [100., 40., 150., 90.]],
                  np.float32)
    rf = ref.responsible_flags(sizes, torch.from_numpy(gt), device='cpu')
    of = ours.responsible_flags(sizes, jnp.asarray(gt))
    for r, o in zip(rf, of):
        np.testing.assert_array_equal(np.asarray(o),
                                      r.numpy().astype(bool))
