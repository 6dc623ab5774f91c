#!/usr/bin/env python
"""Export a trained detector for serving (TPU-native counterpart of the
reference's tools/deployment/pytorch2onnx.py: same role — freeze the
inference graph into a portable artifact — but the artifact is serialized
StableHLO via jax.export, which any XLA runtime (TPU serving, CPU, GPU)
can load without Python model code)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


def main():
    p = argparse.ArgumentParser(
        description='Export a detector to serialized StableHLO')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--output-file', default='model.stablehlo')
    p.add_argument('--shape', type=int, nargs=2, default=[800, 1344],
                   help='static input canvas (h w); export one artifact '
                        'per canvas you serve')
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--platform', default=None,
                   help="lowering platform ('tpu', 'cpu', 'cuda'); "
                        'default: current backend')
    p.add_argument('--device', default='auto',
                   help='jax platform to run the export under')
    args = p.parse_args()
    if args.device != 'auto':
        import jax
        jax.config.update('jax_platforms', args.device)

    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.apis.inference import init_detector

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    h, w = args.shape
    batch = {
        'image': jnp.zeros((args.batch, h, w, 3), jnp.float32),
        'img_shape': jnp.tile(jnp.asarray([[h, w]], jnp.int32),
                              (args.batch, 1)),
        'scale_factor': jnp.ones((args.batch, 4), jnp.float32),
    }

    # close over the variables: the artifact is self-contained
    def predict(b):
        return model.apply(variables, b, method=model.predict)

    platforms = [args.platform] if args.platform else None
    exported = jexport.export(jax.jit(predict),
                              platforms=platforms)(batch)
    blob = exported.serialize()
    with open(args.output_file, 'wb') as f:
        f.write(blob)
    print(f'exported {exported.fun_name} for '
          f'{list(exported.platforms)} '
          f'({len(blob) / 1e6:.1f} MB) -> {args.output_file}')
    print('inputs : ' + ', '.join(str(s) for s in exported.in_avals))
    print('reload : jax.export.deserialize(blob).call(batch)')


if __name__ == '__main__':
    main()
