#!/usr/bin/env python
"""FLOPs/params analysis (reference surface:
tools/analysis_tools/get_flops.py) via jax cost analysis of the compiled
forward."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--shape', type=int, nargs=2, default=[800, 1344])
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
    h, w = args.shape
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = init_variables(model, {'params': jax.random.PRNGKey(0)},
                               x, False)
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(variables['params']))

    lowered = jax.jit(lambda v, x: model.apply(v, x, False)).lower(
        variables, x)
    cost = lowered.compile().cost_analysis()
    flops = (cost or {}).get('flops', float('nan'))
    print(f'input shape: (1, {h}, {w}, 3)')
    print(f'params: {n_params / 1e6:.2f} M')
    print(f'forward flops: {flops / 1e9:.2f} GFLOPs')


if __name__ == '__main__':
    main()
