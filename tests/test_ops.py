import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boxinstseg_tpu.ops import (aligned_bilinear, avg_pool_stride,
                                bbox_overlaps, compute_pairwise_term,
                                distance2bbox, greedy_nms,
                                image_color_similarity, mask_matrix_nms,
                                neighbor_offsets, shift2d, srgb_to_lab,
                                srgb_uint8_to_lab)


def torch_aligned_bilinear(tensor, factor):
    """Reference-math oracle implemented with torch (CPU)."""
    import torch
    import torch.nn.functional as F
    tensor = torch.as_tensor(tensor)
    h, w = tensor.size()[2:]
    tensor = F.pad(tensor, pad=(0, 1, 0, 1), mode='replicate')
    oh, ow = factor * h + 1, factor * w + 1
    tensor = F.interpolate(tensor, size=(oh, ow), mode='bilinear',
                           align_corners=True)
    tensor = F.pad(tensor, pad=(factor // 2, 0, factor // 2, 0),
                   mode='replicate')
    return tensor[:, :, :oh - 1, :ow - 1].numpy()


@pytest.mark.parametrize('factor', [2, 4])
def test_aligned_bilinear_matches_torch(rng, factor):
    x = rng.randn(2, 3, 7, 5).astype(np.float32)  # NCHW for torch
    want = torch_aligned_bilinear(x, factor)
    got = aligned_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), factor)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_srgb_to_lab_vendored_golden():
    """sRGB -> CIELab against VENDORED published reference values
    (Lindbloom / colormine, sRGB D65 -> Lab D65/2deg — the same
    white point and matrix skimage.color.rgb2lab uses), so the Lab
    oracle runs even where skimage isn't installed. Goes red if the
    gamma, matrix, white point, or f(t) branch in ops/color.py is
    perturbed (reference host op: condinst_head.py:1413)."""
    golden = {
        (255, 0, 0): (53.2408, 80.0925, 67.2032),
        (0, 255, 0): (87.7347, -86.1827, 83.1793),
        (0, 0, 255): (32.2970, 79.1875, -107.8602),
        (255, 255, 0): (97.1393, -21.5537, 94.4780),
        (0, 255, 255): (91.1132, -48.0875, -14.1312),
        (255, 0, 255): (60.3242, 98.2343, -60.8249),
        (255, 255, 255): (100.0, 0.0, 0.0),
        (0, 0, 0): (0.0, 0.0, 0.0),
        (128, 128, 128): (53.585, 0.0, 0.0),
        (70, 130, 180): (52.4654, -4.0800, -32.1883),  # steel blue
        (1, 2, 3): (0.5098, -0.1225, -0.4705),  # deep-shadow (linear seg)
    }
    cols = list(golden)
    img = jnp.asarray(np.array(cols, np.float32).reshape(1, -1, 3))
    lab = np.asarray(srgb_uint8_to_lab(img))[0]
    for c, got in zip(cols, lab):
        np.testing.assert_allclose(got, golden[c], atol=0.05,
                                   err_msg=str(c))


def test_srgb_to_lab_matches_skimage(rng):
    try:
        from skimage import color
    except ImportError:
        pytest.skip('skimage unavailable')
    img = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
    want = color.rgb2lab(img)
    got = np.asarray(srgb_uint8_to_lab(jnp.asarray(img, jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_pairwise_term_matches_torch_formulation(rng):
    import torch
    import torch.nn.functional as F

    def torch_unfold_wo_center(x, kernel_size, dilation):
        padding = (kernel_size + (dilation - 1) * (kernel_size - 1)) // 2
        u = F.unfold(x, kernel_size=kernel_size, padding=padding,
                     dilation=dilation)
        u = u.reshape(x.size(0), x.size(1), -1, x.size(2), x.size(3))
        size = kernel_size ** 2
        return torch.cat((u[:, :, :size // 2], u[:, :, size // 2 + 1:]),
                         dim=2)

    def torch_pairwise(mask_logits, k, d):
        log_fg = F.logsigmoid(mask_logits)
        log_bg = F.logsigmoid(-mask_logits)
        lf_u = torch_unfold_wo_center(log_fg, k, d)
        lb_u = torch_unfold_wo_center(log_bg, k, d)
        same_fg = log_fg[:, :, None] + lf_u
        same_bg = log_bg[:, :, None] + lb_u
        m = torch.max(same_fg, same_bg)
        log_same = torch.log(torch.exp(same_fg - m)
                             + torch.exp(same_bg - m)) + m
        return -log_same[:, 0]

    x = rng.randn(3, 9, 11).astype(np.float32) * 3
    want = torch_pairwise(torch.as_tensor(x)[:, None], 3, 2).numpy()
    got = np.asarray(compute_pairwise_term(jnp.asarray(x), 3, 2))
    # zero-padded log-prob unfold: borders must agree too (the reference
    # CUDA kernel does the same: pairwise.cu `ls_py = is_y_pad ? 0 : ...`)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_color_similarity_against_direct(rng):
    img = rng.rand(1, 8, 9, 3).astype(np.float32)
    mask = np.ones((1, 8, 9), np.float32)
    sim = np.asarray(image_color_similarity(jnp.asarray(img),
                                            jnp.asarray(mask), 3, 2))
    offsets = neighbor_offsets(3, 2)
    # direct check at an interior pixel
    y, x = 4, 4
    for k, (dy, dx) in enumerate(offsets):
        diff = img[0, y, x] - img[0, y + dy, x + dx]
        want = np.exp(-np.linalg.norm(diff) * 0.5)
        np.testing.assert_allclose(sim[0, k, y, x], want, atol=1e-5)


def test_greedy_nms_matches_naive(rng):
    n = 40
    boxes = rng.rand(n, 4).astype(np.float32) * 50
    boxes[:, 2:] = boxes[:, :2] + 5 + boxes[:, 2:] * 0.5
    scores = rng.rand(n).astype(np.float32)
    labels = rng.randint(0, 3, (n,)).astype(np.int32)

    def naive_nms(boxes, scores, labels, thr):
        idx = np.argsort(-scores)
        keep = []
        sup = np.zeros(len(scores), bool)
        for i in idx:
            if sup[i] or scores[i] <= 0:
                continue
            keep.append(i)
            for j in idx:
                if j == i or sup[j] or labels[j] != labels[i]:
                    continue
                # IoU
                x1 = max(boxes[i, 0], boxes[j, 0])
                y1 = max(boxes[i, 1], boxes[j, 1])
                x2 = min(boxes[i, 2], boxes[j, 2])
                y2 = min(boxes[i, 3], boxes[j, 3])
                inter = max(x2 - x1, 0) * max(y2 - y1, 0)
                a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                if inter / max(a + b - inter, 1e-6) > thr:
                    sup[j] = True
        return keep

    want = naive_nms(boxes, scores, labels, 0.5)
    keep_idx, keep_valid = greedy_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        0.5, 20)
    got = [int(i) for i, v in zip(keep_idx, keep_valid) if v]
    assert got == want[:20]


def test_mask_matrix_nms_decays_duplicates(rng):
    h = w = 16
    m1 = np.zeros((h, w), np.float32)
    m1[2:10, 2:10] = 1
    m2 = np.zeros((h, w), np.float32)
    m2[3:10, 3:10] = 1          # heavy overlap with m1
    m3 = np.zeros((h, w), np.float32)
    m3[12:15, 12:15] = 1        # disjoint
    masks = jnp.asarray(np.stack([m1, m2, m3]))
    labels = jnp.asarray([0, 0, 0])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.asarray([True, True, True])
    out = np.asarray(mask_matrix_nms(masks, labels, scores, valid))
    assert out[0] == pytest.approx(0.9)      # top mask untouched
    assert out[1] < 0.4                      # duplicate heavily decayed
    assert out[2] > 0.65                     # disjoint barely decayed


def test_avg_pool_and_shift(rng):
    x = rng.rand(1, 8, 8, 2).astype(np.float32)
    p = np.asarray(avg_pool_stride(jnp.asarray(x), 4))
    np.testing.assert_allclose(p[0, 0, 0], x[0, :4, :4].mean(axis=(0, 1)),
                               rtol=1e-6)
    s = np.asarray(shift2d(jnp.asarray(x), 2, -1, h_axis=1))
    np.testing.assert_allclose(s[0, 0, 3], x[0, 2, 2])
    assert np.all(s[0, :, 0] == 0)  # zero pad on shifted-in edge


def test_distance2bbox_roundtrip(rng):
    pts = jnp.asarray(rng.rand(10, 2).astype(np.float32) * 100)
    dist = jnp.asarray(np.abs(rng.rand(10, 4).astype(np.float32)) * 20)
    boxes = distance2bbox(pts, dist)
    from boxinstseg_tpu.ops import bbox2distance
    back = bbox2distance(pts, boxes)
    np.testing.assert_allclose(np.asarray(back), np.asarray(dist), atol=1e-5)


def test_pafpn_and_channelmapper_shapes(rng):
    from boxinstseg_tpu.models.necks import PAFPN, ChannelMapper
    import jax
    feats = tuple(jnp.asarray(rng.randn(1, 32 // s, 40 // s, c)
                              .astype(np.float32))
                  for s, c in [(1, 16), (2, 32), (4, 64)])
    neck = PAFPN(in_channels=[16, 32, 64], out_channels=24, num_outs=5,
                 add_extra_convs='on_output')
    vs = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(vs, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 40, 24)
    assert outs[4].shape[-1] == 24

    cm = ChannelMapper(in_channels=[16, 32, 64], out_channels=24,
                       num_outs=4)
    vs = cm.init(jax.random.PRNGKey(0), feats)
    outs = cm.apply(vs, feats)
    assert len(outs) == 4 and all(o.shape[-1] == 24 for o in outs)


def test_carafe_reassemble_matches_naive(rng):
    from boxinstseg_tpu.ops.carafe import carafe_reassemble
    b, h, w, c, s, k = 1, 5, 6, 3, 2, 3
    x = rng.randn(b, h, w, c).astype(np.float32)
    kern = rng.rand(b, h * s, w * s, k * k).astype(np.float32)
    kern /= kern.sum(-1, keepdims=True)
    got = np.asarray(carafe_reassemble(jnp.asarray(x), jnp.asarray(kern),
                                       s, k))
    want = np.zeros((b, h * s, w * s, c), np.float32)
    half = k // 2
    for oy in range(h * s):
        for ox in range(w * s):
            sy, sx = oy // s, ox // s
            idx = 0
            for dy in range(-half, half + 1):
                for dx in range(-half, half + 1):
                    yy, xx = sy + dy, sx + dx
                    if 0 <= yy < h and 0 <= xx < w:
                        want[0, oy, ox] += kern[0, oy, ox, idx] * x[0, yy, xx]
                    idx += 1
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fpn_carafe_shapes(rng):
    from boxinstseg_tpu.models.necks import FPN_CARAFE
    import jax
    feats = tuple(jnp.asarray(rng.randn(1, 32 // s, 40 // s, c)
                              .astype(np.float32))
                  for s, c in [(1, 16), (2, 32), (4, 64)])
    neck = FPN_CARAFE(in_channels=[16, 32, 64], out_channels=24, num_outs=4)
    vs = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(vs, feats)
    assert len(outs) == 4 and outs[0].shape == (1, 32, 40, 24)


def test_pvt_backbone_shapes(rng):
    from boxinstseg_tpu.models.backbones.pvt import (
        PyramidVisionTransformer, PyramidVisionTransformerV2)
    import jax
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    for cls in (PyramidVisionTransformer, PyramidVisionTransformerV2):
        m = cls(embed_dims=(16, 32, 48, 64), num_layers=(1, 1, 1, 1),
                num_heads=(1, 2, 3, 4), mlp_ratios=(2, 2, 2, 2))
        vs = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(vs, x)
        assert len(outs) == 4
        assert outs[0].shape[1:3] == (16, 24)    # stride 4
        assert outs[3].shape[-1] == 64


def test_resnest_backbone_shapes(rng):
    from boxinstseg_tpu.models.backbones.resnest import ResNeSt
    import jax
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    m = ResNeSt(depth=50, out_indices=(0, 1, 2, 3))
    vs = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vs, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    assert outs[0].shape[1:3] == (16, 24)


def test_detectors_resnet_shapes(rng):
    from boxinstseg_tpu.models.backbones.detectors_resnet import \
        DetectoRS_ResNet
    import jax
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    m = DetectoRS_ResNet(depth=50, out_indices=(0, 1, 2, 3),
                         rfp_inplanes=None)
    vs = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vs, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]


def test_interpolate_bilinear_matches_torch():
    """interpolate_bilinear vs torch F.interpolate for both the integer-
    factor phase fast path (x2, x4, x8) and the general fractional path,
    align_corners False/True."""
    import torch
    import torch.nn.functional as F
    from boxinstseg_tpu.ops.upsample import interpolate_bilinear
    rng = np.random.RandomState(7)
    x = rng.randn(2, 13, 9, 5).astype(np.float32)
    xt = torch.as_tensor(x.transpose(0, 3, 1, 2))
    for out_hw in [(26, 18), (52, 36), (104, 72), (26, 36), (20, 14),
                   (7, 30), (13, 9)]:
        for ac in (False, True):
            want = F.interpolate(xt, size=out_hw, mode='bilinear',
                                 align_corners=ac).numpy()
            got = np.asarray(interpolate_bilinear(
                jnp.asarray(x), out_hw, align_corners=ac))
            np.testing.assert_allclose(
                got.transpose(0, 3, 1, 2), want, rtol=1e-5, atol=1e-5,
                err_msg=f'out_hw={out_hw} align_corners={ac}')
