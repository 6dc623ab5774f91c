"""Weight-converter parity: a torch-initialized ResNet and our flax ResNet
must produce identical features after conversion. torchvision is not in
this image, so the torch oracle is built by hand with torchvision's exact
module naming (conv1/bn1/layerX.Y.convZ/downsample.{0,1})."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boxinstseg_tpu.models.backbones.resnet import ResNet
from boxinstseg_tpu.utils.checkpoint_convert import convert_resnet


def _torch_basicblock(torch, nn, inp, planes, stride):
    block = nn.Module()
    block.conv1 = nn.Conv2d(inp, planes, 3, stride, 1, bias=False)
    block.bn1 = nn.BatchNorm2d(planes)
    block.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
    block.bn2 = nn.BatchNorm2d(planes)
    if stride != 1 or inp != planes:
        block.downsample = nn.Sequential(
            nn.Conv2d(inp, planes, 1, stride, bias=False),
            nn.BatchNorm2d(planes))
    else:
        block.downsample = None

    def fwd(x):
        idn = x
        out = block.bn1(block.conv1(x)).relu()
        out = block.bn2(block.conv2(out))
        if block.downsample is not None:
            idn = block.downsample(x)
        return (out + idn).relu()

    block.fwd = fwd
    return block


def _torch_bottleneck(torch, nn, inp, planes, stride):
    """torchvision Bottleneck naming (conv1/2/3, downsample.{0,1})."""
    block = nn.Module()
    out = planes * 4
    block.conv1 = nn.Conv2d(inp, planes, 1, bias=False)
    block.bn1 = nn.BatchNorm2d(planes)
    block.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
    block.bn2 = nn.BatchNorm2d(planes)
    block.conv3 = nn.Conv2d(planes, out, 1, bias=False)
    block.bn3 = nn.BatchNorm2d(out)
    if stride != 1 or inp != out:
        block.downsample = nn.Sequential(
            nn.Conv2d(inp, out, 1, stride, bias=False),
            nn.BatchNorm2d(out))
    else:
        block.downsample = None

    def fwd(x):
        idn = x
        o = block.bn1(block.conv1(x)).relu()
        o = block.bn2(block.conv2(o)).relu()
        o = block.bn3(block.conv3(o))
        if block.downsample is not None:
            idn = block.downsample(x)
        return (o + idn).relu()

    block.fwd = fwd
    return block


def _torch_resnet50(torch, nn):
    """Full-shape torchvision-named ResNet-50 (zoo-scale stand-in)."""
    torch.manual_seed(0)
    model = nn.Module()
    model.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
    model.bn1 = nn.BatchNorm2d(64)
    model.maxpool = nn.MaxPool2d(3, 2, 1)
    widths = [64, 128, 256, 512]
    depths = [3, 4, 6, 3]
    inp = 64
    for s in range(4):
        blocks = nn.ModuleList()
        for b in range(depths[s]):
            stride = 2 if (s > 0 and b == 0) else 1
            blocks.append(_torch_bottleneck(torch, nn, inp, widths[s],
                                            stride))
            inp = widths[s] * 4
        setattr(model, f'layer{s + 1}', blocks)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.normal_(0, 0.03)
            if isinstance(m, nn.BatchNorm2d):
                m.weight.uniform_(0.8, 1.2)
                m.bias.normal_(0, 0.1)
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


def _torch_resnet18(torch, nn):
    torch.manual_seed(0)
    model = nn.Module()
    model.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
    model.bn1 = nn.BatchNorm2d(64)
    model.maxpool = nn.MaxPool2d(3, 2, 1)
    widths = [64, 128, 256, 512]
    inp = 64
    for s in range(4):
        blocks = nn.ModuleList()
        for b in range(2):
            stride = 2 if (s > 0 and b == 0) else 1
            blocks.append(_torch_basicblock(torch, nn, inp, widths[s],
                                            stride))
            inp = widths[s]
        setattr(model, f'layer{s + 1}', blocks)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.normal_(0, 0.05)
            if isinstance(m, nn.BatchNorm2d):
                m.weight.uniform_(0.8, 1.2)
                m.bias.normal_(0, 0.1)
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


def test_resnet50_feature_parity(rng):
    """Full zoo-shape bottleneck conversion (conv3/bn3 + downsample at
    every stage head) — the path a real torchvision://resnet50 or zoo
    BoxInst .pth takes through convert_resnet."""
    torch = pytest.importorskip('torch')
    from torch import nn
    tmodel = _torch_resnet50(torch, nn)
    params, stats = convert_resnet(tmodel.state_dict())
    jmodel = ResNet(depth=50, out_indices=(0, 1, 2, 3), frozen_stages=-1)

    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        t = torch.as_tensor(x.transpose(0, 3, 1, 2))
        t = tmodel.maxpool(tmodel.bn1(tmodel.conv1(t)).relu())
        feats_t = []
        for s in range(4):
            for block in getattr(tmodel, f'layer{s + 1}'):
                t = block.fwd(t)
            feats_t.append(t.numpy())

    with jax.default_matmul_precision('highest'):
        feats_j = jax.jit(jmodel.apply)(
            {'params': params, 'batch_stats': stats}, jnp.asarray(x))
    assert len(feats_j) == 4
    for lvl, (tj, tt) in enumerate(zip(feats_j, feats_t)):
        np.testing.assert_allclose(
            np.asarray(tj).transpose(0, 3, 1, 2), tt, atol=5e-3, rtol=5e-3,
            err_msg=f'converted ResNet-50 features diverge (C{lvl+2})')


def test_resnet18_feature_parity(rng):
    torch = pytest.importorskip('torch')
    from torch import nn
    tmodel = _torch_resnet18(torch, nn)
    params, stats = convert_resnet(tmodel.state_dict())
    jmodel = ResNet(depth=18, out_indices=(0, 1, 2, 3), frozen_stages=-1)

    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        t = torch.as_tensor(x.transpose(0, 3, 1, 2))
        t = tmodel.maxpool(tmodel.bn1(tmodel.conv1(t)).relu())
        feats_t = []
        for s in range(4):
            for block in getattr(tmodel, f'layer{s + 1}'):
                t = block.fwd(t)
            feats_t.append(t.numpy())

    # default conv precision is bf16-like (TPU MXU semantics); exact f32
    # is needed to compare against the torch oracle.
    with jax.default_matmul_precision('highest'):
        feats_j = jax.jit(jmodel.apply)(
            {'params': params, 'batch_stats': stats}, jnp.asarray(x))
    assert len(feats_j) == 4
    for lvl, (tj, tt) in enumerate(zip(feats_j, feats_t)):
        np.testing.assert_allclose(
            np.asarray(tj).transpose(0, 3, 1, 2), tt, atol=2e-3, rtol=2e-3,
            err_msg=f'converted ResNet features diverge from torch (C{lvl+2})')
