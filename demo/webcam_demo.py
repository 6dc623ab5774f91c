#!/usr/bin/env python
"""Webcam demo (surface parity with the reference's demo/webcam_demo.py:
camera-id + config + checkpoint -> live visualized detections)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--camera-id', type=int, default=0)
    p.add_argument('--score-thr', type=float, default=0.5)
    p.add_argument('--max-frames', type=int, default=None,
                   help='stop after N frames (headless testing)')
    p.add_argument('--out-dir', default=None,
                   help='also save visualized frames here (headless)')
    p.add_argument('--device', default='auto')
    args = p.parse_args()
    if args.device != 'auto':
        import jax
        jax.config.update('jax_platforms', args.device)

    import cv2
    from boxinstseg_tpu.apis.inference import (inference_detector,
                                               init_detector)
    from boxinstseg_tpu.core.visualization import imshow_det_bboxes
    from boxinstseg_tpu.data.coco import COCO_CLASSES

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(args.camera_id)
    if not cap.isOpened():
        raise RuntimeError(f'cannot open camera {args.camera_id}')
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    headless = not os.environ.get('DISPLAY')

    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        result = inference_detector(model, variables, cfg, frame)
        vis = imshow_det_bboxes(
            frame, result['bboxes'], result['labels'],
            segms=result['masks'], class_names=COCO_CLASSES,
            score_thr=args.score_thr,
            out_file=os.path.join(args.out_dir, f'{n:06d}.jpg')
            if args.out_dir else None)
        if not headless:
            cv2.imshow('boxinstseg_tpu', vis)
            if cv2.waitKey(1) == 27:   # ESC
                break
        n += 1
        if args.max_frames is not None and n >= args.max_frames:
            break
    cap.release()
    print(f'processed {n} frames')


if __name__ == '__main__':
    main()
