"""DropBlock regularization (reference: mmdet/models/plugins/dropblock.py
— bernoulli seeds on the valid interior, max-pool dilation to
block_size x block_size, renormalized by kept fraction; linear gamma
warmup driven by the training iteration).

The reference tracks warmup with a Python-side counter; here the
iteration is passed in (everything under jit is traced once), matching
how the BoxInst pairwise warmup rides ``state.step``."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_EPS = 1e-6


class DropBlock(nn.Module):
    drop_prob: float = 0.1
    block_size: int = 3
    warmup_iters: int = 2000

    @nn.compact
    def __call__(self, x, train: bool = False, iteration=None):
        """x: (B, H, W, C). Needs the 'dropout' rng when train=True."""
        assert self.block_size % 2 == 1
        if not train:
            return x
        b, h, w, c = x.shape
        gamma = (self.drop_prob * h * w) / (
            (h - self.block_size + 1) * (w - self.block_size + 1)
            * self.block_size ** 2)
        if iteration is not None and self.warmup_iters > 0:
            gamma = gamma * jnp.minimum(
                1.0, iteration.astype(jnp.float32) / self.warmup_iters)
        rng = self.make_rng('dropout')
        seeds = jax.random.bernoulli(
            rng, gamma,
            (b, h - self.block_size + 1, w - self.block_size + 1, c)
        ).astype(x.dtype)
        pad = self.block_size // 2
        seeds = jnp.pad(seeds, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        dropped = nn.max_pool(seeds, (self.block_size, self.block_size),
                              strides=(1, 1), padding='SAME')
        mask = 1.0 - dropped
        return x * mask * (mask.size / (_EPS + mask.sum()))
