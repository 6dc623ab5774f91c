#!/usr/bin/env python
"""Accelerated batched video demo (reference surface:
demo/video_gpuaccel_demo.py — there, NVDEC decodes on the GPU and frames
run batched through the detector; here the TPU analog: a decode thread
prefetches frames while the chip runs a fixed-batch jitted predict, so
decode and inference overlap and every step is one compiled call).

python demo/video_accel_demo.py VIDEO CONFIG CKPT --batch 4 --out out.mp4
"""
import argparse
import os
import queue
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('video')
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--out', default='video_out.mp4')
    p.add_argument('--batch', type=int, default=4,
                   help='frames per jitted predict call')
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--max-frames', type=int, default=None)
    p.add_argument('--device', default='auto',
                   help="jax platform to pin ('cpu', 'tpu'); "
                        "'auto' keeps the default")
    args = p.parse_args()
    if args.device != 'auto':
        import jax
        jax.config.update('jax_platforms', args.device)

    import time

    import cv2
    import jax
    import jax.numpy as jnp
    from boxinstseg_tpu.apis.inference import init_detector
    from boxinstseg_tpu.apis.test import format_detection
    from boxinstseg_tpu.core.visualization import imshow_det_bboxes
    from boxinstseg_tpu.data.batcher import StaticBatcher
    from boxinstseg_tpu.data.coco import COCO_CLASSES
    from boxinstseg_tpu.data.pipelines import Compose

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    test_pipeline = cfg.get('test_pipeline') or \
        cfg.data['test']['pipeline']
    pipeline = Compose(list(test_pipeline))
    batcher = StaticBatcher(canvases=cfg.get(
        'canvases', [(800, 1344), (1344, 800)]), max_gts=1)

    @jax.jit
    def predict(v, b):
        return model.apply(v, b, method=model.predict)

    # decode + preprocess on a background thread; chip never waits
    q: 'queue.Queue' = queue.Queue(maxsize=4)

    def producer():
        cap = cv2.VideoCapture(args.video)
        fps = cap.get(cv2.CAP_PROP_FPS) or 25
        buf, n = [], 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            r = pipeline({'img': frame, 'filename': None,
                          'bbox_fields': [], 'mask_fields': []})
            buf.append((frame, r))
            n += 1
            if len(buf) == args.batch:
                q.put((fps, buf))
                buf = []
            if args.max_frames and n >= args.max_frames:
                break
        if buf:
            q.put((fps, buf))
        q.put(None)
        cap.release()

    threading.Thread(target=producer, daemon=True).start()

    test_cfg = (cfg.model.get('test_cfg', {}) or {}) \
        if hasattr(cfg, 'model') else {}
    writer, n_out = None, 0
    t0 = time.perf_counter()
    while True:
        item = q.get()
        if item is None:
            break
        fps, chunk = item
        frames = [c[0] for c in chunk]
        samples = [c[1] for c in chunk]
        # pad the tail chunk so the compiled shape never changes
        while len(samples) < args.batch:
            samples.append(samples[-1])
        batch = batcher(samples)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k in ('image', 'img_shape', 'scale_factor')}
        out = jax.device_get(predict(variables, jb))
        for i, frame in enumerate(frames):
            det = format_detection(out, i, batch['img_shape'][i],
                                   batch['ori_shape'][i], test_cfg)
            vis = imshow_det_bboxes(
                frame, det['bboxes'], det['labels'], segms=det['masks'],
                class_names=getattr(cfg, 'classes', None) or COCO_CLASSES,
                score_thr=args.score_thr)
            if writer is None:
                writer = cv2.VideoWriter(
                    args.out, cv2.VideoWriter_fourcc(*'mp4v'), fps,
                    (vis.shape[1], vis.shape[0]))
            writer.write(vis)
            n_out += 1
    if writer:
        writer.release()
    dt = time.perf_counter() - t0
    print(f'wrote {n_out} frames to {args.out} '
          f'({n_out / max(dt, 1e-9):.1f} fps end-to-end)')


if __name__ == '__main__':
    main()
