"""Jitted train-step + multi-device mesh tests (virtual 8-CPU mesh)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_dryrun_multichip_8():
    """The driver-facing multi-chip dry run must compile and execute."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip
    assert len(jax.devices()) >= 8, 'conftest should provide 8 cpu devices'
    dryrun_multichip(8)


def test_train_step_reduces_loss_singleshape():
    """A few SGD steps on one fixed batch must reduce the total loss."""
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.registry import build_detector
    from boxinstseg_tpu.engine import (build_optimizer, create_train_state,
                                       init_variables, make_train_step,
                                       step_lr_schedule)
    from test_boxinst_model import tiny_boxinst_cfg, synthetic_batch

    model = build_detector(tiny_boxinst_cfg())
    batch = synthetic_batch(np.random.RandomState(0))
    variables = init_variables(model, {'params': jax.random.PRNGKey(0)},
                               batch, jnp.zeros((), jnp.int32),
                               method=model.loss)
    tx = build_optimizer(
        dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=1e-4),
        step_lr_schedule(0.01, warmup=None, warmup_iters=0))
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, mesh=None, donate=False)

    losses = []
    for _ in range(6):
        state, logs = step(state, batch)
        losses.append(float(logs['loss']))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], f'loss did not decrease: {losses}'
    assert int(state.step) == 6


def test_train_step_model_without_batch_stats():
    """A model with NO BN anywhere (Swin backbone) must train: flax's
    apply(mutable=[]) still returns an (out, {}) tuple, which the step
    must not mistake for the losses dict (caught on the Swin-L config)."""
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.registry import build_detector
    from boxinstseg_tpu.engine import (build_optimizer, create_train_state,
                                       init_variables, make_train_step,
                                       step_lr_schedule)
    from test_box2mask_model import tiny_cfg, synth_batch

    cfg = tiny_cfg()
    cfg['backbone'] = dict(type='SwinTransformer', embed_dims=16,
                           depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8],
                           window_size=4, out_indices=(0, 1, 2, 3),
                           drop_path_rate=0.0, frozen_stages=-1)
    cfg['panoptic_head']['in_channels'] = [16, 32, 64, 128]
    model = build_detector(cfg)
    batch = synth_batch(np.random.RandomState(0))
    variables = init_variables(model, {'params': jax.random.PRNGKey(0)},
                               batch, jnp.zeros((), jnp.int32),
                               method=model.loss)
    assert 'batch_stats' not in variables, 'cfg unexpectedly has BN'
    tx = build_optimizer(
        dict(type='SGD', lr=0.001, momentum=0.9, weight_decay=1e-4),
        step_lr_schedule(0.001, warmup=None, warmup_iters=0))
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, mesh=None, donate=False)
    state, logs = step(state, batch)
    assert np.isfinite(float(logs['loss']))


def test_lr_schedule_semantics():
    from boxinstseg_tpu.engine import step_lr_schedule
    s = step_lr_schedule(0.01, 'linear', 500, 0.001, (1000, 2000), 0.1)
    assert float(s(0)) == pytest.approx(0.01 * 0.001, rel=1e-3)
    assert float(s(250)) == pytest.approx(0.01 * (1 - 0.5 * 0.999), rel=1e-3)
    assert float(s(500)) == pytest.approx(0.01, rel=1e-5)
    assert float(s(1500)) == pytest.approx(0.001, rel=1e-5)
    assert float(s(2500)) == pytest.approx(0.0001, rel=1e-5)
