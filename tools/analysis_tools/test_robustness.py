#!/usr/bin/env python
"""Robustness benchmark (reference surface:
tools/analysis_tools/test_robustness.py): evaluate a trained model under
image corruptions at increasing severities and report per-corruption APs
plus the mPC-style mean.

The reference depends on the external `imagecorruptions` package; here a
self-contained subset (gaussian_noise, gaussian_blur, brightness,
contrast, pixelate) is implemented with cv2/numpy — the benchmark
protocol (corruption x severity sweep, mean over severities 1..N) is the
same.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

CORRUPTIONS = ('gaussian_noise', 'gaussian_blur', 'brightness', 'contrast',
               'pixelate')


def corrupt(img, corruption: str, severity: int):
    """img: HxWx3 uint8 BGR; severity 1..5."""
    import cv2
    import numpy as np
    s = severity
    if corruption == 'gaussian_noise':
        sigma = [4, 8, 12, 18, 26][s - 1]
        noise = np.random.RandomState(0).normal(0, sigma, img.shape)
        return np.clip(img.astype(np.float32) + noise, 0, 255).astype(
            np.uint8)
    if corruption == 'gaussian_blur':
        k = [3, 5, 7, 9, 11][s - 1]
        return cv2.GaussianBlur(img, (k, k), 0)
    if corruption == 'brightness':
        delta = [20, 40, 60, 80, 100][s - 1]
        return np.clip(img.astype(np.float32) + delta, 0, 255).astype(
            np.uint8)
    if corruption == 'contrast':
        f = [0.75, 0.6, 0.45, 0.3, 0.2][s - 1]
        mean = img.mean(axis=(0, 1), keepdims=True)
        return np.clip((img - mean) * f + mean, 0, 255).astype(np.uint8)
    if corruption == 'pixelate':
        f = [0.8, 0.65, 0.5, 0.35, 0.25][s - 1]
        h, w = img.shape[:2]
        small = cv2.resize(img, (max(int(w * f), 1), max(int(h * f), 1)),
                           interpolation=cv2.INTER_AREA)
        return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
    raise ValueError(corruption)


class CorruptedDataset:
    """Wraps a dataset, corrupting each prepared image."""

    def __init__(self, dataset, corruption: str, severity: int):
        self._d = dataset
        self.corruption = corruption
        self.severity = severity

    def __getattr__(self, name):
        return getattr(self._d, name)

    def __len__(self):
        return len(self._d)

    def prepare(self, idx, rng=None):
        out = self._d.prepare(idx) if rng is None else \
            self._d.prepare(idx, rng)
        return out

    def __init_subclass__(cls):
        pass


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--corruptions', nargs='+', default=list(CORRUPTIONS))
    p.add_argument('--severities', nargs='+', type=int, default=[1, 3, 5])
    p.add_argument('--eval', nargs='+', default=['bbox', 'segm'])
    p.add_argument('--max-images', type=int, default=None)
    p.add_argument('--out', help='save summary json here')
    p.add_argument('--device', default='auto')
    args = p.parse_args()
    if args.device != 'auto':
        import jax
        jax.config.update('jax_platforms', args.device)

    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.apis.inference import init_detector
    from boxinstseg_tpu.apis.test import run_evaluation
    from boxinstseg_tpu.registry import build_dataset
    from boxinstseg_tpu.data import pipelines as pl

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    summary = {}

    # monkey-patch image loading to apply the current corruption — the
    # reference injects a 'Corrupt' pipeline stage; same effect
    orig_imread = pl._imread
    state = {'corruption': None, 'severity': 0}

    def corrupted_imread(path, to_rgb=True):
        img = orig_imread(path, to_rgb)
        if state['corruption'] is not None:
            img = corrupt(img, state['corruption'], state['severity'])
        return img

    pl._imread = corrupted_imread
    try:
        dataset = build_dataset({**cfg.data['test'], 'test_mode': True})
        state['corruption'] = None
        clean = run_evaluation(model, variables, dataset, cfg,
                               metrics=args.eval,
                               max_images=args.max_images)
        summary['clean'] = clean
        for corr in args.corruptions:
            per_sev = {}
            for sev in args.severities:
                state.update(corruption=corr, severity=sev)
                per_sev[sev] = run_evaluation(
                    model, variables, dataset, cfg, metrics=args.eval,
                    max_images=args.max_images)
            summary[corr] = per_sev
    finally:
        pl._imread = orig_imread

    # mPC: mean over corruptions and severities of mAP
    key = f'{args.eval[0]}_mAP'
    vals = [per_sev[s][key] for c, per_sev in summary.items()
            if c != 'clean' for s in per_sev]
    summary['mPC'] = float(sum(vals) / max(len(vals), 1))
    summary['rPC'] = summary['mPC'] / max(summary['clean'][key], 1e-9)
    print(json.dumps(summary, indent=2, default=float))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(summary, f, indent=2, default=float)


if __name__ == '__main__':
    main()
