#!/usr/bin/env python
"""Inference FPS benchmark (reference surface:
tools/analysis_tools/benchmark.py) — times the jitted predict step on
synthetic batches."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--batch-size', type=int, default=1)
    p.add_argument('--height', type=int, default=800)
    p.add_argument('--width', type=int, default=1344)
    p.add_argument('--iters', type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.config import Config
    from boxinstseg_tpu.registry import build_detector
    from boxinstseg_tpu.engine import init_variables

    cfg = Config.fromfile(args.config)
    model = build_detector(cfg.model.copy())
    b, h, w = args.batch_size, args.height, args.width
    batch = {
        'image': jnp.asarray(
            np.random.randn(b, h, w, 3).astype(np.float32)),
        'img_shape': jnp.asarray([[h, w]] * b, jnp.int32),
        'scale_factor': jnp.ones((b, 4), jnp.float32),
    }
    variables = init_variables(model, {'params': jax.random.PRNGKey(0)},
                               batch['image'], False)

    @jax.jit
    def predict(v, batch):
        return model.apply(v, batch, method=model.predict)

    out = predict(variables, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = predict(variables, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = b * args.iters / dt
    print(f'inference: {fps:.2f} img/s ({dt / args.iters * 1000:.1f} '
          f'ms/batch of {b})')


if __name__ == '__main__':
    main()
