"""Swin converter parity: a torch mini-Swin built with the reference's
(mmdet) module naming and forward math must produce identical features
through convert_swin + our flax SwinTransformer.

Covers the risky layout bits: qkv head ordering, relative-position bias
indexing (mmdet double_step_seq+flip == official formula), shifted-window
masking, and the mmcv PatchMerging unfold channel order (which differs
from our block-major 2x2 concat — the converter permutes for it).
Reference math: mmdet/models/backbones/swin.py:81-260.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from boxinstseg_tpu.models.backbones.swin import SwinTransformer
from boxinstseg_tpu.utils.checkpoint_convert import convert_swin

EMBED = 16
DEPTHS = (2, 2)
HEADS = (2, 4)
WS = 4  # window size


def _build_torch_swin(torch, nn):
    torch.manual_seed(0)

    def double_step_seq(step1, len1, step2, len2):
        seq1 = torch.arange(0, step1 * len1, step1)
        seq2 = torch.arange(0, step2 * len2, step2)
        return (seq1[:, None] + seq2[None, :]).reshape(1, -1)

    class WindowMSA(nn.Module):
        def __init__(self, dim, heads):
            super().__init__()
            self.dim, self.heads = dim, heads
            self.scale = (dim // heads) ** -0.5
            self.relative_position_bias_table = nn.Parameter(
                torch.randn((2 * WS - 1) ** 2, heads) * 0.5)
            rel = double_step_seq(2 * WS - 1, WS, 1, WS)
            rel = (rel + rel.T).flip(1).contiguous()
            self.register_buffer('relative_position_index', rel)
            self.qkv = nn.Linear(dim, dim * 3, bias=True)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x, mask=None):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.heads,
                                      C // self.heads).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * self.scale) @ k.transpose(-2, -1)
            bias = self.relative_position_bias_table[
                self.relative_position_index.view(-1)].view(N, N, -1)
            attn = attn + bias.permute(2, 0, 1)[None]
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.view(B // nW, nW, self.heads, N, N) \
                    + mask[None, :, None]
                attn = attn.view(-1, self.heads, N, N)
            attn = attn.softmax(-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Attn(nn.Module):    # = ShiftWindowMSA shell (named attn.w_msa)
        def __init__(self, dim, heads, shift):
            super().__init__()
            self.w_msa = WindowMSA(dim, heads)
            self.shift = shift

        def forward(self, x):  # x: (B, H, W, C)
            B, H, W, C = x.shape
            if self.shift:
                x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
                img = torch.zeros((1, H, W, 1))
                cnt = 0
                for hs in (slice(0, -WS), slice(-WS, -self.shift),
                           slice(-self.shift, None)):
                    for ws_ in (slice(0, -WS), slice(-WS, -self.shift),
                                slice(-self.shift, None)):
                        img[:, hs, ws_, :] = cnt
                        cnt += 1
                mw = img.view(1, H // WS, WS, W // WS, WS, 1).permute(
                    0, 1, 3, 2, 4, 5).reshape(-1, WS * WS)
                am = mw[:, None] - mw[:, :, None]
                mask = am.masked_fill(am != 0, -100.0)
            else:
                mask = None
            wins = x.view(B, H // WS, WS, W // WS, WS, C).permute(
                0, 1, 3, 2, 4, 5).reshape(-1, WS * WS, C)
            wins = self.w_msa(wins, mask)
            x = wins.view(B, H // WS, W // WS, WS, WS, C).permute(
                0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
            if self.shift:
                x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
            return x

    class FFN(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.layers = nn.Sequential(
                nn.Sequential(nn.Linear(dim, dim * 4), nn.GELU()),
                nn.Linear(dim * 4, dim))

        def forward(self, x):
            return self.layers(x)

    class Block(nn.Module):
        def __init__(self, dim, heads, shift):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim)
            self.attn = Attn(dim, heads, shift)
            self.norm2 = nn.LayerNorm(dim)
            self.ffn = FFN(dim)

        def forward(self, x):  # (B, H, W, C)
            x = x + self.attn(self.norm1(x))
            return x + self.ffn(self.norm2(x))

    class PatchMerging(nn.Module):    # mmcv unfold-based layout
        def __init__(self, dim):
            super().__init__()
            self.norm = nn.LayerNorm(4 * dim)
            self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

        def forward(self, x):  # (B, H, W, C)
            B, H, W, C = x.shape
            t = x.permute(0, 3, 1, 2)
            t = torch.nn.functional.unfold(t, 2, stride=2)  # (B, 4C, L)
            t = t.transpose(1, 2)                           # (B, L, 4C)
            t = self.reduction(self.norm(t))
            return t.view(B, H // 2, W // 2, -1)

    class Stage(nn.Module):
        def __init__(self, dim, depth, heads, last):
            super().__init__()
            self.blocks = nn.ModuleList(
                [Block(dim, heads, 0 if b % 2 == 0 else WS // 2)
                 for b in range(depth)])
            self.downsample = None if last else PatchMerging(dim)

    class PatchEmbed(nn.Module):
        def __init__(self):
            super().__init__()
            self.projection = nn.Conv2d(3, EMBED, 4, 4)
            self.norm = nn.LayerNorm(EMBED)

        def forward(self, x):  # (B, 3, H, W) -> (B, H/4, W/4, C)
            x = self.projection(x).permute(0, 2, 3, 1)
            return self.norm(x)

    class Swin(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = PatchEmbed()
            self.stages = nn.ModuleList(
                [Stage(EMBED * 2 ** i, DEPTHS[i], HEADS[i],
                       i == len(DEPTHS) - 1) for i in range(len(DEPTHS))])
            for i, d in enumerate(DEPTHS):
                self.add_module(f'norm{i}',
                                nn.LayerNorm(EMBED * 2 ** i))

        def forward(self, x):
            x = self.patch_embed(x)
            outs = []
            for i, st in enumerate(self.stages):
                for blk in st.blocks:
                    x = blk(x)
                outs.append(getattr(self, f'norm{i}')(x))
                if st.downsample is not None:
                    x = st.downsample(x)
            return outs

    m = Swin()
    with torch.no_grad():
        for p in m.parameters():
            p.normal_(0, 0.05)
    m.eval()
    return m


def test_swin_convert_feature_parity(rng):
    torch = pytest.importorskip('torch')
    from torch import nn
    tmodel = _build_torch_swin(torch, nn)
    params, stats = convert_swin(tmodel.state_dict())
    assert not stats

    jmodel = SwinTransformer(
        embed_dims=EMBED, depths=DEPTHS, num_heads=HEADS, window_size=WS,
        out_indices=tuple(range(len(DEPTHS))), drop_path_rate=0.0)

    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        feats_t = [f.numpy() for f in
                   tmodel(torch.as_tensor(x.transpose(0, 3, 1, 2)))]
    with jax.default_matmul_precision('highest'):
        feats_j = jax.jit(jmodel.apply)({'params': params}, jnp.asarray(x))
    assert len(feats_j) == len(feats_t)
    for lvl, (fj, ft) in enumerate(zip(feats_j, feats_t)):
        np.testing.assert_allclose(np.asarray(fj), ft, atol=2e-4, rtol=2e-4,
                                   err_msg=f'swin stage {lvl} diverges')
