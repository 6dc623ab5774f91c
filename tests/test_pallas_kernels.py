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


def test_analytic_pairwise_vjp_matches_autodiff(rng):
    """boxinst_pairwise_loss has a hand-derived backward (the XLA dual of
    pairwise.cu:52-66); it must equal autodiff through the formula."""
    import jax
    from boxinstseg_tpu.ops.pairwise import (_pairwise_num_den,
                                             boxinst_pairwise_loss)
    B, K, H, W = 2, 4, 18, 22
    logits = jnp.asarray(rng.randn(B, K, H, W).astype(np.float32) * 2)
    sim = jnp.asarray(rng.rand(B, 8, H, W).astype(np.float32))
    masks = jnp.asarray((rng.rand(B, K, H, W) > 0.4).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, K) > 0.3)

    def plain(x):
        num, den = _pairwise_num_den(x, sim, masks, valid, 0.3, 3, 2)
        return num / jnp.maximum(den, 1.0)

    v1, g1 = jax.value_and_grad(plain)(logits)
    v2, g2 = jax.value_and_grad(
        lambda x: boxinst_pairwise_loss(x, sim, masks, valid, 0.3, 3, 2))(
        logits)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


# ------------------------------------------------------------------ LCM


def test_lcm_pallas_forward_matches_xla_refine(rng):
    """VMEM LCM kernel (interpret) == the XLA scan refine, including the
    replicate-pad clamp semantics at all four borders."""
    from boxinstseg_tpu.models.losses.levelset_loss import (
        LocalConsistencyModule)
    from boxinstseg_tpu.ops.pallas_kernels import lcm_refine_pallas

    imgs = jnp.asarray(rng.rand(2, 3, 12, 17).astype(np.float32))
    phis = jnp.asarray(rng.rand(2, 5, 12, 17).astype(np.float32))
    lcm = LocalConsistencyModule(dilations=(2,), num_iter=4)
    want = np.asarray(lcm(imgs, phis))           # cpu backend: XLA path
    aff = lcm._affinity(imgs)[:, 0]
    got = np.asarray(lcm_refine_pallas(aff, phis, lcm._offsets(), 4,
                                       c_tile=2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lcm_pallas_transpose_is_adjoint(rng):
    """<A x, y> == <x, A^T y> for the kernel pair (the transpose kernel
    is the custom-VJP backward on TPU)."""
    from boxinstseg_tpu.models.losses.levelset_loss import (
        LocalConsistencyModule)
    from boxinstseg_tpu.ops.pallas_kernels import lcm_refine_pallas

    imgs = jnp.asarray(rng.rand(1, 3, 11, 13).astype(np.float32))
    x = jnp.asarray(rng.rand(1, 3, 11, 13).astype(np.float32))
    y = jnp.asarray(rng.rand(1, 3, 11, 13).astype(np.float32))
    lcm = LocalConsistencyModule(dilations=(2,), num_iter=3)
    aff = lcm._affinity(imgs)[:, 0]
    offs = lcm._offsets()
    ax = np.asarray(lcm_refine_pallas(aff, x, offs, 3, c_tile=1,
                                      interpret=True))
    aty = np.asarray(lcm_refine_pallas(aff, y, offs, 3, c_tile=1,
                                       transpose=True, interpret=True))
    lhs = float((ax * np.asarray(y)).sum())
    rhs = float((np.asarray(x) * aty).sum())
    assert lhs == pytest.approx(rhs, rel=1e-5)


def test_lcm_pallas_transpose_matches_xla_grad(rng):
    """Kernel-pair VJP == autodiff/custom-VJP gradient of the XLA path."""
    from boxinstseg_tpu.models.losses.levelset_loss import (
        LocalConsistencyModule)
    from boxinstseg_tpu.ops.pallas_kernels import lcm_refine_pallas

    imgs = jnp.asarray(rng.rand(1, 3, 10, 14).astype(np.float32))
    phis = jnp.asarray(rng.rand(1, 4, 10, 14).astype(np.float32))
    box = jnp.asarray((rng.rand(1, 4, 10, 14) > 0.3).astype(np.float32))
    lcm = LocalConsistencyModule(dilations=(2,), num_iter=4)
    aff = lcm._affinity(imgs)[:, 0]
    offs = lcm._offsets()

    def loss_xla(p):
        return (jnp.abs(lcm(imgs, p) - p) * box).sum()

    def loss_kern(p):
        @jax.custom_vjp
        def refine(q):
            return lcm_refine_pallas(aff, q, offs, 4, interpret=True)

        def fwd(q):
            return refine(q), None

        def bwd(_, g):
            return (lcm_refine_pallas(aff, g, offs, 4, transpose=True,
                                      interpret=True),)

        refine.defvjp(fwd, bwd)
        return (jnp.abs(refine(p) - p) * box).sum()

    v1, g1 = jax.value_and_grad(loss_xla)(phis)
    v2, g2 = jax.value_and_grad(loss_kern)(phis)
    assert float(v2) == pytest.approx(float(v1), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-4, atol=1e-6)
