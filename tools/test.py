#!/usr/bin/env python
"""Evaluation entry point (surface parity with the reference's
tools/test.py: CONFIG CHECKPOINT --eval bbox segm)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def parse_args():
    p = argparse.ArgumentParser(description='Evaluate a detector')
    p.add_argument('config')
    p.add_argument('checkpoint', help='orbax checkpoint dir or reference '
                                      '.pth to convert')
    p.add_argument('--eval', nargs='+', default=['bbox', 'segm'])
    p.add_argument('--max-images', type=int, default=None)
    p.add_argument('--out', help='save metrics json here')
    p.add_argument('--save-results', help='save raw per-image results json')
    p.add_argument('--cfg-options', nargs='+', default=[])
    p.add_argument('--launcher', default='none')
    p.add_argument('--device', default='auto', help="jax platform to pin ('cpu', 'tpu'); 'auto' keeps the default")
    return p.parse_args()


def main():
    args = parse_args()
    if args.device != 'auto':
        import jax
        jax.config.update('jax_platforms', args.device)
    from boxinstseg_tpu.config import Config
    from boxinstseg_tpu.registry import build_dataset
    from boxinstseg_tpu.apis.inference import init_detector
    from boxinstseg_tpu.apis.test import run_evaluation
    from boxinstseg_tpu.utils.logging import get_root_logger

    cfg = Config.fromfile(args.config)
    overrides = {}
    for kv in args.cfg_options:
        k, v = kv.split('=', 1)
        overrides[k] = v
    cfg.merge_from_dict(overrides)

    logger = get_root_logger()
    model, variables, cfg = init_detector(cfg, args.checkpoint)
    dataset = build_dataset({**cfg.data['test'], 'test_mode': True})
    metrics = run_evaluation(model, variables, dataset, cfg,
                             metrics=args.eval,
                             max_images=args.max_images,
                             save_results=args.save_results)
    logger.info(f'metrics: {metrics}')
    print(json.dumps(metrics, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(metrics, f, indent=2)


if __name__ == '__main__':
    main()
