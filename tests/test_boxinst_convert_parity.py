"""Converted-checkpoint FORWARD parity for the full BoxInst graph:
a torch model built with the reference's module naming and forward math
(FPN mmdet/models/necks/fpn.py, CondInstBoxHead forward_single
condinst_head.py:330-362, CondInstMaskBranch :972-1038) must produce
identical FPN features, head logits, and mask-branch features after
convert_reference_checkpoint — the strongest AP-parity proxy available
without the reference's trained weights."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from boxinstseg_tpu.registry import build_detector
from boxinstseg_tpu.utils.checkpoint_convert import \
    convert_reference_checkpoint

C = 32          # fpn channels
NUM_CLASSES = 4
GN_GROUPS = 4
PARAMS = 169   # tiny cfg: 3 dyn convs, 8 ch, rel coords


def _build_torch_boxinst(torch, nn, zoo=False):
    """Reference-named torch BoxInst. ``zoo=True`` builds the FULL
    boxinst_r50_fpn_1x shapes (reference config: R-50, FPN 256,
    4-stack GN(32) towers, mask branch 4x128 -> 16, 233 dyn-conv
    params, 80 classes) so torch2jax is exercised at zoo scale."""
    from test_weight_convert import _torch_resnet18, _torch_resnet50

    if zoo:
        C_, NC_, GN_, PARAMS_ = 256, 80, 32, 233
        fpn_ins = [512, 1024, 2048]
        stacks, br_convs, br_ch, br_out = 4, 4, 128, 16
    else:
        C_, NC_, GN_, PARAMS_ = C, NUM_CLASSES, GN_GROUPS, PARAMS
        fpn_ins = [128, 256, 512]
        stacks, br_convs, br_ch, br_out = 1, 1, 16, 8

    torch.manual_seed(0)
    backbone = (_torch_resnet50 if zoo else _torch_resnet18)(torch, nn)

    class FPN(nn.Module):
        def __init__(self):
            super().__init__()
            ins = fpn_ins                    # start_level=1
            self.lateral_convs = nn.ModuleList()
            self.fpn_convs = nn.ModuleList()
            for i, cin in enumerate(ins):
                lat = nn.Module()
                lat.conv = nn.Conv2d(cin, C_, 1)
                self.lateral_convs.append(lat)
                fc = nn.Module()
                fc.conv = nn.Conv2d(C_, C_, 3, padding=1)
                self.fpn_convs.append(fc)
            for _ in range(2):               # extra convs (P6, P7)
                fc = nn.Module()
                fc.conv = nn.Conv2d(C_, C_, 3, 2, 1)
                self.fpn_convs.append(fc)

        def forward(self, feats):            # feats: C3, C4, C5
            import torch.nn.functional as F
            lat = [m.conv(x) for m, x in zip(self.lateral_convs, feats)]
            for i in range(len(lat) - 1, 0, -1):
                lat[i - 1] = lat[i - 1] + F.interpolate(
                    lat[i], size=lat[i - 1].shape[-2:], mode='nearest')
            outs = [self.fpn_convs[i].conv(lat[i]) for i in range(len(lat))]
            outs.append(self.fpn_convs[3].conv(outs[-1]))       # P6
            outs.append(self.fpn_convs[4].conv(F.relu(outs[-1])))  # P7
            return outs

    class Tower(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(C_, C_, 3, padding=1)
            self.gn = nn.GroupNorm(GN_, C_)

        def forward(self, x):
            return self.gn(self.conv(x)).relu()

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            self.cls_convs = nn.ModuleList([Tower() for _ in range(stacks)])
            self.reg_convs = nn.ModuleList([Tower() for _ in range(stacks)])
            self.conv_cls = nn.Conv2d(C_, NC_, 3, padding=1)
            self.conv_reg = nn.Conv2d(C_, 4, 3, padding=1)
            self.conv_centerness = nn.Conv2d(C_, 1, 3, padding=1)
            self.scales = nn.ModuleList()
            for _ in range(5):
                s = nn.Module()
                s.scale = nn.Parameter(torch.tensor(1.0))
                self.scales.append(s)

        def forward(self, feats, param_conv, strides):
            import torch.nn.functional as F
            outs = {'cls': [], 'bbox': [], 'ctr': [], 'param': []}
            for lvl, x in enumerate(feats):
                cf = x
                for m in self.cls_convs:
                    cf = m(cf)
                rf = x
                for m in self.reg_convs:
                    rf = m(rf)
                outs['cls'].append(self.conv_cls(cf))
                bb = F.relu(self.conv_reg(rf) * self.scales[lvl].scale)
                outs['bbox'].append(bb * strides[lvl])   # eval mode
                outs['ctr'].append(self.conv_centerness(cf))
                outs['param'].append(param_conv(rf))
            return outs

    class Branch(nn.Module):
        def __init__(self):
            super().__init__()
            def cm(cin, cout, k=3, p=1):
                m = nn.Module()
                m.conv = nn.Conv2d(cin, cout, k, padding=p, bias=False)
                m.bn = nn.BatchNorm2d(cout)
                return m
            self.refines = nn.ModuleList([cm(C_, br_ch) for _ in range(3)])
            self.mask_branch = nn.Sequential(
                *[cm(br_ch, br_ch) for _ in range(br_convs)],
                nn.Conv2d(br_ch, br_out, 1))

        def forward(self, feats, aligned_bilinear):
            x = self._cm(self.refines[0], feats[0])
            for i, s in zip((1, 2), (2, 4)):
                p = self._cm(self.refines[i], feats[i])
                x = x + aligned_bilinear(p, s)
            for m in self.mask_branch[:-1]:
                x = self._cm(m, x)
            return self.mask_branch[-1](x)

        @staticmethod
        def _cm(m, x):
            return m.bn(m.conv(x)).relu()

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = backbone
            self.neck = FPN()
            self.bbox_head = Head()
            self.mask_branch = Branch()
            mh = nn.Module()
            mh.param_conv = nn.Conv2d(C_, PARAMS_, 3, padding=1)
            self.mask_head = mh

    m = Model()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.Conv2d):
                mod.weight.normal_(0, 0.03)
                if mod.bias is not None:
                    mod.bias.normal_(0, 0.02)
            if isinstance(mod, (nn.BatchNorm2d, nn.GroupNorm)):
                mod.weight.uniform_(0.8, 1.2)
                mod.bias.normal_(0, 0.05)
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.7, 1.3)
        for s in m.bbox_head.scales:
            s.scale.fill_(float(np.random.RandomState(0).uniform(0.8, 1.3)))
    m.eval()
    return m


def test_boxinst_converted_forward_parity(rng):
    torch = pytest.importorskip('torch')
    from torch import nn
    from test_boxinst_model import tiny_boxinst_cfg
    from ref_oracle import load_ref

    tmodel = _build_torch_boxinst(torch, nn)
    params, stats = convert_reference_checkpoint(tmodel.state_dict())

    cfg = tiny_boxinst_cfg()
    cfg['mask_branch']['branch_channels'] = 16
    cfg['mask_branch']['branch_out_channels'] = 8
    model = build_detector(cfg)

    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    ref_ab = load_ref('mmdet/models/dense_heads/condinst_head.py',
                      ['aligned_bilinear'])['aligned_bilinear']
    with torch.no_grad():
        t = torch.as_tensor(x.transpose(0, 3, 1, 2))
        c2345 = []
        t2 = tmodel.backbone.maxpool(
            tmodel.backbone.bn1(tmodel.backbone.conv1(t)).relu())
        for s in range(4):
            for block in getattr(tmodel.backbone, f'layer{s + 1}'):
                t2 = block.fwd(t2)
            c2345.append(t2)
        fpn_t = tmodel.neck(c2345[1:])
        head_t = tmodel.bbox_head(fpn_t, tmodel.mask_head.param_conv,
                                  [8, 16, 32, 64, 128])
        branch_t = tmodel.mask_branch(fpn_t[:3], ref_ab)

    variables = {'params': params, 'batch_stats': stats}
    with jax.default_matmul_precision('highest'):
        outs_j, mask_feat_j = jax.jit(
            lambda v, xx: model.apply(v, xx, train=False))(
            variables, jnp.asarray(x))

    for lvl in range(5):
        for key in ('cls', 'bbox', 'ctr', 'param'):
            got = np.asarray(outs_j[key][lvl]).transpose(0, 3, 1, 2)
            want = head_t[key][lvl].numpy()
            np.testing.assert_allclose(
                got, want, atol=2e-3, rtol=2e-3,
                err_msg=f'{key} level {lvl} diverges after conversion')
    np.testing.assert_allclose(
        np.asarray(mask_feat_j).transpose(0, 3, 1, 2), branch_t.numpy(),
        atol=2e-3, rtol=2e-3, err_msg='mask branch diverges')
