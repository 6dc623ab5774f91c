#!/usr/bin/env python
"""Build an unannotated COCO-style json from a folder of images
(reference: tools/dataset_converters/images2coco.py — same purpose:
run inference/test on unlabeled data through the standard dataset path)."""
import argparse
import json
import os
import struct


def _image_size(path):
    """Read (w, h) from JPEG/PNG headers without decoding (no deps)."""
    with open(path, 'rb') as f:
        head = f.read(32)
        if head[:8] == b'\x89PNG\r\n\x1a\n':
            w, h = struct.unpack('>II', head[16:24])
            return int(w), int(h)
        if head[:2] == b'\xff\xd8':  # JPEG: walk markers to SOFn
            f.seek(2)
            while True:
                marker = f.read(2)
                if len(marker) < 2 or marker[0] != 0xFF:
                    break
                code = marker[1]
                if code in (0xD8, 0xD9) or 0xD0 <= code <= 0xD7:
                    continue
                size = struct.unpack('>H', f.read(2))[0]
                if 0xC0 <= code <= 0xCF and code not in (0xC4, 0xC8, 0xCC):
                    f.read(1)
                    h, w = struct.unpack('>HH', f.read(4))
                    return int(w), int(h)
                f.seek(size - 2, 1)
    # fallback: decode with PIL (always present via torchvision deps)
    from PIL import Image
    with Image.open(path) as im:
        return im.size


def main():
    p = argparse.ArgumentParser(
        description='Convert an image folder to a COCO-style json')
    p.add_argument('img_path', help='directory of images')
    p.add_argument('classes', help='text file with one class name per line')
    p.add_argument('out', help='output annotation json (saved next to '
                               'img_path unless an absolute path)')
    p.add_argument('--exclude-extensions', nargs='+', default=[])
    args = p.parse_args()

    with open(args.classes) as f:
        classes = [c.strip() for c in f if c.strip()]
    exts = ('.jpg', '.jpeg', '.png', '.bmp')
    files = sorted(
        f for f in os.listdir(args.img_path)
        if f.lower().endswith(exts)
        and not any(f.lower().endswith(e) for e in args.exclude_extensions))
    images = []
    for i, name in enumerate(files):
        w, h = _image_size(os.path.join(args.img_path, name))
        images.append(dict(id=i + 1, file_name=name, width=w, height=h))
    out = args.out if os.path.isabs(args.out) else os.path.join(
        args.img_path, '..', args.out)
    with open(out, 'w') as f:
        json.dump(dict(
            images=images, annotations=[],
            categories=[dict(id=i + 1, name=c)
                        for i, c in enumerate(classes)]), f)
    print(f'{len(images)} images -> {out}')


if __name__ == '__main__':
    main()
