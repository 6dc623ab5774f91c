"""Benchmark: BoxInst R-50-FPN 1x training throughput (images/sec/chip).

Runs the full jitted train step (backbone+FPN+heads+BoxInst losses+SGD)
on synthetic 800x1344 canvases with the reference config's shapes
(reference recipe: configs/boxinst/boxinst_r50_fpn_1x_coco.py, 2 img/GPU
on 8xA100). Prints ONE JSON line.

Defaults: batch 8 per chip, bf16 mixed precision (activations bf16,
params/losses f32 — the TPU dual of the reference's Fp16OptimizerHook).
Override with BENCH_BATCH / BENCH_BF16=0 env vars.

vs_baseline: the reference publishes no throughput; BASELINE.md sets the
target at >=2x images/sec/chip vs the 8-GPU A100 run. A100 mmdet-style
CondInst/BoxInst training runs at ~0.25 s/iter for 16 images => ~8
img/s/GPU; we report vs_baseline = (our img/s/chip) / 8.0.
"""
import json
import os
import time

import numpy as np


def _step_flops(step, state, batch):
    """Per-step FLOPs from XLA's own cost analysis (0 if unavailable)."""
    try:
        compiled = step.lower(state, batch).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get('flops', 0.0))
    except Exception:
        return 0.0


def main():
    import jax
    import jax.numpy as jnp
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.registry import build_detector
    from boxinstseg_tpu.engine import (build_optimizer, create_train_state,
                                       init_variables, make_train_step,
                                       step_lr_schedule)
    from boxinstseg_tpu.models.layers import set_compute_dtype
    from __graft_entry__ import _boxinst_cfg, _synth_batch

    batch_size = int(os.environ.get('BENCH_BATCH', 8))
    use_bf16 = os.environ.get('BENCH_BF16', '1') != '0'
    if use_bf16:
        set_compute_dtype(jnp.bfloat16)
    h, w = 800, 1344

    model = build_detector(_boxinst_cfg())
    batch = _synth_batch(batch_size, h, w, max_gt=32)
    variables = init_variables(model, {'params': jax.random.PRNGKey(0)},
                               batch, jnp.zeros((), jnp.int32),
                               method=model.loss)
    sched = step_lr_schedule(0.005, 'linear', 500, 0.001, (60000, 80000))
    tx = build_optimizer(dict(type='SGD', lr=0.005, momentum=0.9,
                              weight_decay=1e-4), sched)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, mesh=None, donate=True)

    # warmup/compile.  A host fetch (not block_until_ready) bounds the
    # timed region: some remote-tunnel runtimes acknowledge enqueue
    # before execution, so block_until_ready can return immediately —
    # only a device->host transfer provably waits for the result.
    state, logs = step(state, batch)
    float(logs['loss'])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = step(state, batch)
    # the final loss depends on the final state, which chains through
    # every donated step — one 4-byte fetch forces all `iters` steps
    float(logs['loss'])
    dt = time.perf_counter() - t0

    img_per_sec = batch_size * iters / dt
    baseline = 8.0  # est. img/s per A100 for the 8-GPU reference run

    # MFU against v5e peak (197 TFLOP/s bf16); flops from XLA cost analysis
    flops = _step_flops(step, state, batch)
    peak = 197e12 if 'v5' in (jax.devices()[0].device_kind or '') \
        else 197e12
    mfu = (flops * iters / dt) / peak if flops else 0.0

    print(json.dumps({
        'metric': 'boxinst_r50_1x_train_images_per_sec_per_chip',
        'value': round(img_per_sec, 3),
        'unit': 'images/sec/chip',
        'vs_baseline': round(img_per_sec / baseline, 3),
        'batch_per_chip': batch_size,
        'precision': 'bf16' if use_bf16 else 'f32',
        'step_time_ms': round(1000 * dt / iters, 2),
        'mfu': round(mfu, 4),
    }))


if __name__ == '__main__':
    main()
