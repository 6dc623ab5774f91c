"""Benchmark: BoxInst R-50-FPN 1x training throughput (images/sec/chip).

Runs the full jitted train step (backbone+FPN+heads+BoxInst losses+SGD)
on synthetic 800x1344 canvases with the reference config's shapes
(reference recipe: configs/boxinst/boxinst_r50_fpn_1x_coco.py, 2 img/GPU
on 8xA100). Prints ONE JSON line.

vs_baseline: the reference publishes no throughput; BASELINE.md sets the
target at >=2x images/sec/chip vs the 8-GPU A100 run. A100 mmdet-style
CondInst/BoxInst training runs at ~0.25 s/iter for 16 images => ~8
img/s/GPU; we report vs_baseline = (our img/s/chip) / 8.0.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.registry import build_detector
    from boxinstseg_tpu.engine import (build_optimizer, create_train_state,
                                       init_variables, make_train_step,
                                       step_lr_schedule)
    from __graft_entry__ import _boxinst_cfg, _synth_batch

    batch_size = int(__import__('os').environ.get('BENCH_BATCH', 4))
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

    # warmup/compile
    state, logs = step(state, batch)
    jax.block_until_ready(logs['loss'])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = step(state, batch)
    jax.block_until_ready(logs['loss'])
    dt = time.perf_counter() - t0

    img_per_sec = batch_size * iters / dt
    baseline = 8.0  # est. img/s per A100 for the 8-GPU reference run
    print(json.dumps({
        'metric': 'boxinst_r50_1x_train_images_per_sec_per_chip',
        'value': round(img_per_sec, 3),
        'unit': 'images/sec/chip',
        'vs_baseline': round(img_per_sec / baseline, 3),
    }))


if __name__ == '__main__':
    main()
