#!/usr/bin/env python
"""Single-image demo (surface parity with the reference's
demo/image_demo.py: img + config + checkpoint -> visualized result)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('img', help='image file')
    p.add_argument('config', help='config file')
    p.add_argument('checkpoint', help='checkpoint dir or .pth')
    p.add_argument('--out-file', default='demo_out.jpg')
    p.add_argument('--score-thr', type=float, default=0.3)
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
    result = inference_detector(model, variables, cfg, args.img)
    img = cv2.imread(args.img)
    imshow_det_bboxes(img, result['bboxes'], result['labels'],
                      segms=result['masks'], class_names=COCO_CLASSES,
                      score_thr=args.score_thr, out_file=args.out_file)
    print(f'saved to {args.out_file} '
          f'({len(result["bboxes"])} detections)')


if __name__ == '__main__':
    main()
