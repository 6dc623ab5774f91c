#!/usr/bin/env python
"""Prepare a checkpoint for release (reference:
tools/model_converters/publish_model.py — strips optimizer state, stamps
the filename with a content hash). Input is an orbax checkpoint dir as
written by training; output is a single msgpack file holding only
params + batch_stats (+ meta), named ``<out>-<sha256[:8]>.msgpack``."""
import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


def main():
    p = argparse.ArgumentParser(
        description='Process a checkpoint to be published')
    p.add_argument('in_dir', help='orbax checkpoint dir (work_dir/ckpts)')
    p.add_argument('out_file', help='output filename (.msgpack)')
    p.add_argument('--step', type=int, default=None,
                   help='which step to publish (default: latest)')
    args = p.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import orbax.checkpoint as ocp
    from flax import serialization

    mgr = ocp.CheckpointManager(os.path.abspath(args.in_dir))
    step = args.step if args.step is not None else mgr.latest_step()
    if step is None:
        raise SystemExit(f'no checkpoints in {args.in_dir}')
    state = mgr.restore(step)
    mgr.close()
    keep = {k: state[k] for k in ('params', 'batch_stats') if k in state}
    meta_path = os.path.join(args.in_dir, 'meta.json')
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            keep['meta'] = json.load(f)
    blob = serialization.msgpack_serialize(keep)

    out = args.out_file
    if out.endswith('.msgpack'):
        out = out[:-len('.msgpack')]
    sha = hashlib.sha256(blob).hexdigest()
    final = f'{out}-{sha[:8]}.msgpack'
    with open(final, 'wb') as f:
        f.write(blob)
    print(f'step {step} ({len(blob) / 1e6:.1f} MB) -> {final}')


if __name__ == '__main__':
    main()
