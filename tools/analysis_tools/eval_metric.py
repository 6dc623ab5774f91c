#!/usr/bin/env python
"""Re-evaluate saved result files (reference surface:
tools/analysis_tools/eval_metric.py). Results are the json produced by
tools/test.py --save-results."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('results', help='json results file from tools/test.py')
    p.add_argument('--eval', nargs='+', default=['bbox', 'segm'])
    args = p.parse_args()

    import numpy as np
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.config import Config
    from boxinstseg_tpu.registry import build_dataset

    cfg = Config.fromfile(args.config)
    dataset = build_dataset({**cfg.data['test'], 'test_mode': True})
    with open(args.results) as f:
        raw = json.load(f)
    results = []
    for r in raw:
        results.append(dict(
            bboxes=np.asarray(r['bboxes'], np.float64).reshape(-1, 5),
            labels=np.asarray(r['labels'], np.int64),
            masks=r.get('masks')))
    metrics = dataset.evaluate(results, metric=args.eval)
    print(json.dumps(metrics, indent=2))


if __name__ == '__main__':
    main()
