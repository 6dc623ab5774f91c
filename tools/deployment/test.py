#!/usr/bin/env python
"""Evaluate an exported StableHLO artifact against the dataset
(reference: tools/deployment/test.py does this for ONNX/TensorRT engines;
here the artifact is the jax.export blob from export_model.py — this
validates the frozen graph end to end, including numerics parity with
the live model).

The artifact is compiled for ONE static (batch, h, w) signature, so pass
the same --shape/--batch used at export time; the eval loader is pinned
to that single canvas."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


def main():
    p = argparse.ArgumentParser(
        description='Run COCO evaluation through an exported model')
    p.add_argument('config')
    p.add_argument('model', help='serialized StableHLO artifact')
    p.add_argument('--shape', type=int, nargs=2, default=[800, 1344],
                   help='canvas (h w) the artifact was exported with')
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--eval', nargs='+', default=['segm'])
    p.add_argument('--max-images', type=int, default=None)
    p.add_argument('--device', default='auto')
    args = p.parse_args()
    if args.device != 'auto':
        import jax
        jax.config.update('jax_platforms', args.device)

    import json
    import jax
    from jax import export as jexport
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.apis.inference import init_detector
    from boxinstseg_tpu.apis.test import run_evaluation
    from boxinstseg_tpu.registry import build_dataset

    with open(args.model, 'rb') as f:
        exported = jexport.deserialize(bytearray(f.read()))
    model, _, cfg = init_detector(args.config)
    cfg.canvases = [tuple(args.shape)]  # pin the loader to the export sig
    frozen_call = jax.jit(exported.call)

    # run_evaluation drives model.apply(variables, batch, method=predict);
    # swap in the frozen graph (weights are baked into the artifact)
    class _Frozen:
        def apply(self, variables, batch, method=None, **kw):
            return frozen_call({k: batch[k] for k in (
                'image', 'img_shape', 'scale_factor')})

        def __getattr__(self, name):
            return getattr(model, name)

    dataset = build_dataset({**cfg.data['test'], 'test_mode': True})
    metrics = run_evaluation(_Frozen(), {}, dataset, cfg,
                             metrics=args.eval, batch_size=args.batch,
                             max_images=args.max_images)
    print(json.dumps(metrics, indent=2, default=float))


if __name__ == '__main__':
    main()
