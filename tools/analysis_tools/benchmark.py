#!/usr/bin/env python
"""FPS benchmark (reference surface: tools/analysis_tools/benchmark.py) —
times the jitted predict step, or the full train step with ``--train``,
for ANY config family on synthetic batches.

Timing is state-threaded (each iteration's input depends on the previous
output) — repeated identical executions can be served from a cache by
remote-tunnel runtimes and report impossible numbers otherwise.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--batch-size', type=int, default=1)
    p.add_argument('--height', type=int, default=800)
    p.add_argument('--width', type=int, default=1344)
    p.add_argument('--iters', type=int, default=20)
    p.add_argument('--train', action='store_true',
                   help='benchmark the training step instead of inference')
    p.add_argument('--max-gts', type=int, default=32)
    p.add_argument('--bf16', action='store_true')
    p.add_argument('--device', default='auto')
    return p.parse_args()


def _train_batch(np, jnp, b, h, w, g):
    rng = np.random.RandomState(0)
    boxes = np.zeros((b, g, 4), np.float32)
    labels = rng.randint(0, 3, (b, g)).astype(np.int32)
    valid = np.zeros((b, g), bool)
    masks = np.zeros((b, g, h // 4, w // 4), np.uint8)
    for i in range(b):
        n = rng.randint(2, g + 1)
        for k in range(n):
            x1 = rng.randint(0, w - 200)
            y1 = rng.randint(0, h - 200)
            bw, bh = rng.randint(60, 200, 2)
            boxes[i, k] = [x1, y1, x1 + bw, y1 + bh]
            valid[i, k] = True
            masks[i, k, y1 // 4:(y1 + bh) // 4, x1 // 4:(x1 + bw) // 4] = 1
    return {
        'image': jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
        'img_shape': jnp.asarray([[h, w]] * b, jnp.int32),
        'pixels_removed': jnp.asarray([10] * b, jnp.int32),
        'gt_bboxes': jnp.asarray(boxes),
        'gt_labels': jnp.asarray(labels),
        'gt_valid': jnp.asarray(valid),
        'gt_masks': jnp.asarray(masks),
        'scale_factor': jnp.ones((b, 4), jnp.float32),
    }


def main():
    args = parse_args()
    if args.device != 'auto':
        import jax
        jax.config.update('jax_platforms', args.device)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.config import Config
    from boxinstseg_tpu.registry import build_detector
    from boxinstseg_tpu.engine import init_variables
    from boxinstseg_tpu.models.layers import set_compute_dtype

    if args.bf16:
        set_compute_dtype(jnp.bfloat16)

    cfg = Config.fromfile(args.config)
    model = build_detector(cfg.model.copy())
    b, h, w = args.batch_size, args.height, args.width

    if args.train:
        from boxinstseg_tpu.engine import (build_optimizer,
                                           create_train_state,
                                           make_train_step,
                                           make_ts_train_step,
                                           step_lr_schedule)
        batch = _train_batch(np, jnp, b, h, w, args.max_gts)
        variables = init_variables(
            model, {'params': jax.random.PRNGKey(0)}, batch,
            jnp.zeros((), jnp.int32), method=model.loss)
        sched = step_lr_schedule(0.01, 'linear', 500, 0.001, (60000,))
        tx = build_optimizer(dict(type='SGD', lr=0.01, momentum=0.9,
                                  weight_decay=1e-4), sched)
        use_ts = cfg.model.get('type') in ('DiscoBoxSOLOv2',
                                           'SingleStageWSInsTSDetector')
        state = create_train_state(model, variables, tx, ema=use_ts)
        step = (make_ts_train_step(model, tx, mesh=None)
                if use_ts else make_train_step(model, tx, mesh=None,
                                               donate=True))
        state, logs = step(state, batch)
        float(logs['loss'])                    # host fetch: see note below
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, logs = step(state, batch)   # state-threaded
        # the final loss chains through every step's updated state; a
        # 4-byte host fetch provably waits for all of them (some remote
        # tunnels ack enqueue before execution, so block_until_ready
        # can return before the device has run anything)
        float(logs['loss'])
        dt = (time.perf_counter() - t0) / args.iters
        print(f'train: {b / dt:.2f} img/s/chip ({dt * 1000:.1f} ms/step, '
              f'batch {b})')
        return

    img = jnp.asarray(np.random.randn(b, h, w, 3).astype(np.float32))
    batch = {
        'image': img,
        'img_shape': jnp.asarray([[h, w]] * b, jnp.int32),
        'scale_factor': jnp.ones((b, 4), jnp.float32),
    }
    variables = init_variables(model, {'params': jax.random.PRNGKey(0)},
                               batch['image'], False)

    @jax.jit
    def predict_chained(v, batch, i):
        # the iteration counter perturbs the input so consecutive
        # executions never see identical buffers, and a *runtime* score
        # feedback (not `* 0.0`, which constant-folds away) makes every
        # iteration's input depend on the previous iteration's outputs —
        # so the single final host fetch forces the whole chain to have
        # actually executed on device
        batch = dict(batch, image=batch['image'] + i * 1e-6)
        out = model.apply(v, batch, method=model.predict)
        fb = sum(jnp.sum(o).astype(jnp.float32) for o in
                 jax.tree_util.tree_leaves(out)) * 1e-30
        return out, batch['image'] + fb

    (out, img) = predict_chained(variables, batch, jnp.float32(0))
    float(img[0, 0, 0, 0])                     # host fetch ends warmup
    t0 = time.perf_counter()
    for it in range(args.iters):
        batch['image'] = img
        out, img = predict_chained(variables, batch, jnp.float32(it + 1))
    # 4-byte fetch; waits for all `iters` chained executions (remote
    # tunnels can ack enqueue before execution — block_until_ready is
    # not a sync point there)
    float(img[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    fps = b * args.iters / dt
    print(f'inference: {fps:.2f} img/s ({dt / args.iters * 1000:.1f} '
          f'ms/batch of {b})')


if __name__ == '__main__':
    main()
