"""Mixed-precision (bf16) policy: activations bf16, params f32, losses f32
(TPU dual of the reference Fp16OptimizerHook + force_fp32,
mmdet/apis/train.py:182-189)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import boxinstseg_tpu  # noqa: F401
from boxinstseg_tpu.models.layers import set_compute_dtype
from boxinstseg_tpu.registry import build_detector


@pytest.fixture(autouse=True)
def _reset_policy():
    yield
    set_compute_dtype(None)


def test_bf16_boxinst_losses_match_f32():
    from test_boxinst_model import synthetic_batch, tiny_boxinst_cfg
    from boxinstseg_tpu.engine import init_variables

    batch = synthetic_batch(np.random.RandomState(0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    it = jnp.zeros((), jnp.int32)

    def run():
        model = build_detector(tiny_boxinst_cfg())
        variables = init_variables(model, {'params': jax.random.PRNGKey(0)},
                                   batch, it, method=model.loss)
        losses = jax.jit(
            lambda v: model.apply(v, batch, it, method=model.loss,
                                  mutable=['batch_stats'])[0])(variables)
        return variables, losses

    set_compute_dtype(None)
    _, losses32 = run()
    set_compute_dtype(jnp.bfloat16)
    variables, losses16 = run()

    # params stay f32
    leaves = jax.tree_util.tree_leaves(variables['params'])
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)
    # losses are f32 scalars, finite, and close to the f32 run
    for k, v in losses16.items():
        assert v.dtype == jnp.float32, k
        assert np.isfinite(float(v)), k
        ref = float(losses32[k])
        got = float(v)
        assert abs(got - ref) <= 0.05 * max(abs(ref), 0.2), (k, got, ref)


def test_bf16_train_step_and_predict():
    from test_boxinst_model import synthetic_batch, tiny_boxinst_cfg
    from boxinstseg_tpu.engine import (create_train_state, init_variables,
                                       make_train_step)
    import optax

    set_compute_dtype(jnp.bfloat16)
    model = build_detector(tiny_boxinst_cfg())
    batch = synthetic_batch(np.random.RandomState(0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = init_variables(model, {'params': jax.random.PRNGKey(0)},
                               batch, jnp.zeros((), jnp.int32),
                               method=model.loss)
    tx = optax.sgd(1e-3, momentum=0.9)
    state = create_train_state(model, variables, tx)
    step_fn = make_train_step(model, tx)
    state, logs = step_fn(state, batch)
    assert np.isfinite(float(logs['loss']))
    # grads/updates land in f32 params
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)

    out = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))(
        state.variables(),
        {'image': batch['image'], 'img_shape': batch['img_shape'],
         'scale_factor': batch['scale_factor']})
    assert np.isfinite(np.asarray(out['scores'])).all()
