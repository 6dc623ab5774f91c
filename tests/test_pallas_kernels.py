"""Pallas pairwise-loss kernel vs the XLA reference formulation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boxinstseg_tpu.ops.pairwise import boxinst_pairwise_loss
from boxinstseg_tpu.ops.pallas_kernels import boxinst_pairwise_loss_pallas


def _inputs(rng, b=2, k=8, h=32, w=48):
    logits = rng.randn(b, k, h, w).astype(np.float32) * 2
    sim = rng.rand(b, 8, h, w).astype(np.float32)
    masks = (rng.rand(b, k, h, w) > 0.5).astype(np.float32)
    valid = rng.rand(b, k) > 0.2
    return (jnp.asarray(logits), jnp.asarray(sim), jnp.asarray(masks),
            jnp.asarray(valid))


def test_pallas_forward_matches_xla(rng):
    logits, sim, masks, valid = _inputs(rng)
    want = float(boxinst_pairwise_loss(logits, sim, masks, valid, 0.3))
    got = float(boxinst_pairwise_loss_pallas(
        logits, sim, masks, valid, 0.3, 3, 2, True))  # interpret mode
    assert got == pytest.approx(want, rel=1e-5)


def test_pallas_grad_matches_xla(rng):
    logits, sim, masks, valid = _inputs(rng, b=1, k=8, h=16, w=24)

    g_xla = jax.grad(lambda x: boxinst_pairwise_loss(
        x, sim, masks, valid, 0.3))(logits)
    g_pl = jax.grad(lambda x: boxinst_pairwise_loss_pallas(
        x, sim, masks, valid, 0.3, 3, 2, True))(logits)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_xla),
                               atol=1e-5, rtol=1e-4)
