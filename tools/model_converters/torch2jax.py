#!/usr/bin/env python
"""Convert a reference-trained torch ``.pth`` checkpoint to this
framework's msgpack format (TPU-native analog of the reference's
model_converters — here the conversion crosses frameworks, so it wraps
boxinstseg_tpu.utils.checkpoint_convert.convert_reference_checkpoint,
the same dispatcher apis/inference.py uses for on-the-fly .pth loads)."""
import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


def main():
    p = argparse.ArgumentParser(
        description='Convert a reference torch checkpoint to msgpack')
    p.add_argument('in_file', help='torch .pth checkpoint')
    p.add_argument('out_file', help='output .msgpack path')
    p.add_argument('--hash', action='store_true',
                   help='append content sha256[:8] to the filename')
    args = p.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import torch
    from flax import serialization
    from boxinstseg_tpu.utils.checkpoint_convert import \
        convert_reference_checkpoint

    ckpt = torch.load(args.in_file, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt)
    params, batch_stats = convert_reference_checkpoint(sd)
    keep = dict(params=params, batch_stats=batch_stats)
    if isinstance(ckpt, dict) and 'meta' in ckpt:
        meta = ckpt['meta']
        keep['meta'] = {
            k: list(meta[k]) if isinstance(meta[k], tuple) else meta[k]
            for k in ('CLASSES', 'mmdet_version', 'epoch', 'iter')
            if isinstance(meta, dict) and k in meta}
    blob = serialization.msgpack_serialize(keep)
    out = args.out_file
    if args.hash:
        stem = out[:-len('.msgpack')] if out.endswith('.msgpack') else out
        out = f'{stem}-{hashlib.sha256(blob).hexdigest()[:8]}.msgpack'
    with open(out, 'wb') as f:
        f.write(blob)
    n = sum(1 for _ in jax.tree_util.tree_leaves(params))
    print(f'{n} param tensors ({len(blob) / 1e6:.1f} MB) -> {out}')


if __name__ == '__main__':
    main()
