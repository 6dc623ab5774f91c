"""Train state + jitted global-batch train step.

Replaces the reference's runner/DDP/Fp16OptimizerHook stack
(reference: mmdet/apis/train.py:117-244) with one compiled function: loss,
grads, optimizer update, BN stats and the BoxInst warmup counter all live
inside the jit; data parallelism comes from sharding the batch over the
mesh and letting XLA insert the gradient reductions.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_variables(model, rngs, *args, method=None):
    """Jit-compiled model.init — eager init dispatches one XLA compile per
    primitive (minutes); one jit makes it a single compile."""
    import functools
    fn = functools.partial(model.init, method=method) if method is not None \
        else model.init
    # bools stay static (e.g. a `train` flag branching in python)
    static = tuple(i + 1 for i, a in enumerate(args) if isinstance(a, bool))
    return jax.jit(fn, static_argnums=static)(rngs, *args)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                      # () int32 — also BoxInst _iter
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None                 # teacher / EMA replica (DiscoBox)
    ema_batch_stats: Any = None
    avg_loss_ins: Any = None               # DiscoBox gating scalar
    corr_state: Any = None                 # DiscoBox object bank

    def variables(self):
        v = {'params': self.params}
        if self.batch_stats is not None:
            v['batch_stats'] = self.batch_stats
        return v

    def teacher_variables(self):
        v = {'params': self.ema_params}
        if self.ema_batch_stats is not None:
            v['batch_stats'] = self.ema_batch_stats
        return v


def create_train_state(model, variables, tx: optax.GradientTransformation,
                       ema: bool = False, corr_state: Any = None
                       ) -> TrainState:
    params = variables['params']
    # a REAL buffer copy — identity tree_map would alias the student's
    # arrays and break buffer donation (same buffer donated twice)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get('batch_stats'),
        opt_state=tx.init(params),
        ema_params=copy(params) if ema else None,
        ema_batch_stats=copy(variables.get('batch_stats')) if ema else None,
        # reference initializes the running loss gate at 2.0
        # (single_stage_ts.py:163)
        avg_loss_ins=jnp.asarray(2.0, jnp.float32) if ema else None,
        corr_state=corr_state,
    )


def make_train_step(model, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    axis_name: str = 'data',
                    donate: bool = True) -> Callable:
    """Build the jitted train step.

    The returned fn: (state, batch) -> (state, logs). ``batch`` is the
    GLOBAL batch; shard it with ``parallel.shard_batch`` before calling.
    The loss (reference semantics: _parse_losses sums every '*loss*' key,
    base.py:176-254) is computed over the global batch, so per-count
    normalizations already match DDP's reduce_mean'd denominators.
    """

    def loss_fn(params, batch_stats, batch, step):
        variables = {'params': params}
        mutable = []
        if batch_stats is not None:
            variables['batch_stats'] = batch_stats
            mutable = ['batch_stats']
        # NOTE: mutable=[] would still make flax return an (out, {})
        # tuple — pass False when the model carries no batch_stats at
        # all (Swin backbones have no BN; caught on the Swin-L config)
        out = model.apply(variables, batch, step, method=model.loss,
                          mutable=mutable or False)
        if mutable:
            losses, new_state = out
            new_bs = new_state.get('batch_stats')
        else:
            losses, new_bs = out, None
        total = sum(v for k, v in losses.items() if 'loss' in k)
        return total, (losses, new_bs)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   state.step)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs if new_bs is not None else state.batch_stats,
            opt_state=new_opt,
        )
        logs = {k: v for k, v in losses.items()}
        logs['loss'] = total
        logs['grad_norm'] = optax.global_norm(grads)
        return new_state, logs

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_ts_train_step(model, tx: optax.GradientTransformation,
                       mesh: Optional[Mesh] = None,
                       axis_name: str = 'data',
                       momentum: float = 0.999,
                       start_iter: int = 13000,
                       ts_thresh: float = 0.3,
                       corr_thresh: float = 0.2,
                       use_teacher: bool = True,
                       donate: bool = True) -> Callable:
    """Teacher-student train step (DiscoBox).

    Reference semantics (single_stage_ts.py:179-237): losses gated on a
    running ``avg_loss_ins`` (EMA 0.9/0.1 of loss_ins); the EMA teacher is
    copied from the student at ``start_iter`` and momentum-updated after.
    Here gates are traced scalars and the EMA update runs inside the same
    compiled step: ema <- student before start_iter (exact copy), EMA
    after.
    """

    def loss_fn(params, batch_stats, batch, step, teacher_out, gates,
                bank):
        variables = {'params': params}
        mutable = []
        if batch_stats is not None:
            variables['batch_stats'] = batch_stats
            mutable = ['batch_stats']
        out = model.apply(variables, batch, step, teacher_out, gates,
                          bank, method=model.loss, mutable=mutable or False)
        if mutable:
            losses, new_state = out
            new_bs = new_state.get('batch_stats')
        else:
            losses, new_bs = out, None
        corr_append = losses.pop('_corr_append', None)
        total = sum(v for k, v in losses.items()
                    if 'loss' in k and not k.startswith('_'))
        return total, (losses, new_bs, corr_append)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        turn_on = jnp.asarray(
            use_teacher, jnp.float32) * (state.step > start_iter)
        gates = dict(
            teacher=turn_on.astype(jnp.float32),
            ts=(state.avg_loss_ins < ts_thresh).astype(jnp.float32),
            corr=(state.avg_loss_ins < corr_thresh).astype(jnp.float32),
        )

        # the reference runs the teacher forward ONLY after the 13k-iter
        # switch-on (single_stage_ts.py:195-199, turn_on_teacher) — the
        # cond skips a full backbone+neck+head forward per step before
        # that; the closed branch's zeros are multiplied by the
        # teacher=0 gate anyway (student stands in for the teacher).
        def t_fwd(_):
            return model.apply(state.teacher_variables(), batch['image'],
                               method=model.teacher_outputs)

        def t_zero(_):
            shapes = jax.eval_shape(t_fwd, None)
            return jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)

        if use_teacher and start_iter <= 0:
            teacher_out = t_fwd(None)     # always on: no cond overhead
        else:
            teacher_out = jax.lax.cond(turn_on > 0, t_fwd, t_zero, None)
        teacher_out = jax.lax.stop_gradient(teacher_out)

        (total, (losses, new_bs, corr_append)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   state.step, teacher_out, gates,
                                   state.corr_state)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        after = (state.step >= start_iter)
        m = jnp.where(after, momentum, 0.0)
        ema = jax.tree_util.tree_map(
            lambda e, p: m * e + (1.0 - m) * p,
            state.ema_params, new_params)
        new_bs_eff = new_bs if new_bs is not None else state.batch_stats
        ema_bs = state.ema_batch_stats
        if ema_bs is not None and new_bs_eff is not None:
            ema_bs = jax.tree_util.tree_map(
                lambda e, p: m * e + (1.0 - m) * p, ema_bs, new_bs_eff)
        new_avg = state.avg_loss_ins * 0.9 + 0.1 * losses['loss_ins']

        new_bank = state.corr_state
        if new_bank is not None and corr_append is not None:
            from ..ops.correspondence import bank_append
            new_bank = bank_append(
                new_bank, corr_append['labels'], corr_append['feats'],
                corr_append['masks'], corr_append['boxes'],
                corr_append['valid'])

        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_bs_eff, opt_state=new_opt,
            ema_params=ema, ema_batch_stats=ema_bs,
            avg_loss_ins=new_avg, corr_state=new_bank)
        logs = {k: v for k, v in losses.items()}
        logs['loss'] = total
        logs['avg_loss_ins'] = state.avg_loss_ins
        logs['grad_norm'] = optax.global_norm(grads)
        return new_state, logs

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(train_step, in_shardings=(repl, data),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh: Optional[Mesh] = None,
                   axis_name: str = 'data') -> Callable:
    """Jitted predict step: (variables, batch) -> detections dict."""

    def eval_step(variables, batch):
        return model.apply(variables, batch, method=model.predict)

    if mesh is None:
        return jax.jit(eval_step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(eval_step, in_shardings=(repl, data), out_shardings=data)
