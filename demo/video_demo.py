#!/usr/bin/env python
"""Video demo (reference surface: demo/video_demo.py) — runs the jitted
detector frame by frame and writes an annotated video."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('video')
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--out', default='video_out.mp4')
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--max-frames', type=int, default=None)
    p.add_argument('--device', default='auto', help="jax platform to pin ('cpu', 'tpu'); 'auto' keeps the default")
    args = p.parse_args()
    if args.device != 'auto':
        import jax
        jax.config.update('jax_platforms', args.device)

    import cv2
    from boxinstseg_tpu.apis.inference import init_detector, \
        inference_detector
    from boxinstseg_tpu.core.visualization import imshow_det_bboxes
    from boxinstseg_tpu.data.coco import COCO_CLASSES

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(args.video)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    writer = None
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        result = inference_detector(model, variables, cfg, frame)
        vis = imshow_det_bboxes(frame, result['bboxes'], result['labels'],
                                segms=result['masks'],
                                class_names=COCO_CLASSES,
                                score_thr=args.score_thr)
        if writer is None:
            writer = cv2.VideoWriter(
                args.out, cv2.VideoWriter_fourcc(*'mp4v'), fps,
                (vis.shape[1], vis.shape[0]))
        writer.write(vis)
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    cap.release()
    if writer:
        writer.release()
    print(f'wrote {n} frames to {args.out}')


if __name__ == '__main__':
    main()
