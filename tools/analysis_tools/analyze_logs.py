#!/usr/bin/env python
"""Training-log analysis (reference surface:
tools/analysis_tools/analyze_logs.py): parse train.log lines emitted by
the loop and plot/print loss curves and timing."""
import argparse
import re
from collections import defaultdict


LINE = re.compile(
    r'Iter \[(\d+)/(\d+)\].*?time: ([\d.]+)s/iter \(([\d.]+) img/s\) (.*)')
KV = re.compile(r'([\w.]+): ([-\d.einf]+)')


def parse(path):
    series = defaultdict(list)
    iters = []
    with open(path) as f:
        for line in f:
            m = LINE.search(line)
            if not m:
                continue
            it = int(m.group(1))
            iters.append(it)
            series['time'].append(float(m.group(3)))
            series['img_per_sec'].append(float(m.group(4)))
            for k, v in KV.findall(m.group(5)):
                try:
                    series[k].append(float(v))
                except ValueError:
                    pass
    return iters, series


def main():
    p = argparse.ArgumentParser()
    p.add_argument('task', choices=['plot_curve', 'cal_train_time'])
    p.add_argument('logs', nargs='+')
    p.add_argument('--keys', nargs='+', default=['loss'])
    p.add_argument('--out', default=None)
    args = p.parse_args()

    for log in args.logs:
        iters, series = parse(log)
        if args.task == 'cal_train_time':
            times = series.get('time', [])
            if times:
                print(f'{log}: mean {sum(times) / len(times):.4f} s/iter, '
                      f'fastest {min(times):.4f}, slowest {max(times):.4f}')
            continue
        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            for k in args.keys:
                if k in series:
                    plt.plot(iters[:len(series[k])], series[k], label=k)
            plt.legend()
            plt.xlabel('iter')
            out = args.out or 'curve.png'
            plt.savefig(out)
            print(f'saved {out}')
        except ImportError:
            for k in args.keys:
                vals = series.get(k, [])
                if vals:
                    print(f'{k}: first={vals[0]:.4f} last={vals[-1]:.4f} '
                          f'min={min(vals):.4f}')


if __name__ == '__main__':
    main()
