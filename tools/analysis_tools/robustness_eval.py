#!/usr/bin/env python
"""Summarize corruption-robustness results (reference:
tools/analysis_tools/robustness_eval.py — prints P / mPC / rPC from the
summary produced by test_robustness.py; ours reads the json that
tools/analysis_tools/test_robustness.py --out writes)."""
import argparse
import json

BENCHMARK_CORRUPTIONS = (
    'gaussian_noise', 'shot_noise', 'impulse_noise', 'defocus_blur',
    'motion_blur', 'brightness', 'contrast', 'pixelate', 'jpeg',
)


def main():
    p = argparse.ArgumentParser(
        description='Print P/mPC/rPC from a robustness summary json')
    p.add_argument('filename', help='json written by test_robustness --out')
    p.add_argument('--task', default='bbox', choices=['bbox', 'segm'])
    p.add_argument('--prints', nargs='+', default=['mPC'],
                   choices=['P', 'mPC', 'rPC'])
    p.add_argument('--aggregate', default='benchmark',
                   choices=['benchmark', 'all'],
                   help="'benchmark' averages only the standard corruption "
                        "set; 'all' averages every corruption in the file")
    args = p.parse_args()

    with open(args.filename) as f:
        summary = json.load(f)
    key = f'{args.task}_mAP'
    clean = summary.get('clean', {}).get(key)
    vals = []
    for corr, per_sev in summary.items():
        if corr in ('clean', 'mPC', 'rPC'):
            continue
        if args.aggregate == 'benchmark' and \
                corr not in BENCHMARK_CORRUPTIONS:
            continue
        for sev, metrics in sorted(per_sev.items()):
            vals.append(metrics[key])
            print(f'{corr:>16s} sev={sev}: {key}={metrics[key]:.4f}')
    mpc = sum(vals) / max(len(vals), 1)
    if 'P' in args.prints and clean is not None:
        print(f'Performance on clean data [P] ({key}) = {clean:.4f}')
    if 'mPC' in args.prints:
        print(f'Mean performance under corruption [mPC] ({key}) '
              f'= {mpc:.4f}')
    if 'rPC' in args.prints and clean:
        print(f'Relative performance under corruption [rPC] '
              f'= {100.0 * mpc / clean:.1f} %')


if __name__ == '__main__':
    main()
