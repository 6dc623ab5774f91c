#!/usr/bin/env python
"""Download dataset archives (reference: tools/misc/download_dataset.py —
same dataset keys and layout). Uses urllib only; in an egress-restricted
environment it prints the URLs and exits non-zero so scripts can fall
back to a mirror."""
import argparse
import os
import sys
import urllib.error
import urllib.request

DATASETS = {
    'coco2017': [
        'http://images.cocodataset.org/zips/train2017.zip',
        'http://images.cocodataset.org/zips/val2017.zip',
        'http://images.cocodataset.org/zips/test2017.zip',
        'http://images.cocodataset.org/annotations/'
        'annotations_trainval2017.zip',
    ],
    'voc2012': [
        'http://host.robots.ox.ac.uk/pascal/VOC/voc2012/'
        'VOCtrainval_11-May-2012.tar',
    ],
    'voc2007': [
        'http://host.robots.ox.ac.uk/pascal/VOC/voc2007/'
        'VOCtrainval_06-Nov-2007.tar',
        'http://host.robots.ox.ac.uk/pascal/VOC/voc2007/'
        'VOCtest_06-Nov-2007.tar',
    ],
    'lvis': [
        'https://s3-us-west-2.amazonaws.com/dl.fbaipublicfiles.com/LVIS/'
        'lvis_v1_train.json.zip',
        'https://s3-us-west-2.amazonaws.com/dl.fbaipublicfiles.com/LVIS/'
        'lvis_v1_val.json.zip',
    ],
}


def main():
    p = argparse.ArgumentParser(description='Download dataset archives')
    p.add_argument('--dataset-name', default='coco2017',
                   choices=sorted(DATASETS))
    p.add_argument('--save-dir', default='data')
    p.add_argument('--unzip', action='store_true')
    p.add_argument('--delete', action='store_true',
                   help='delete archives after unzip')
    args = p.parse_args()

    os.makedirs(args.save_dir, exist_ok=True)
    failed = []
    for url in DATASETS[args.dataset_name]:
        dst = os.path.join(args.save_dir, os.path.basename(url))
        if os.path.exists(dst):
            print(f'exists: {dst}')
            continue
        print(f'downloading {url}')
        try:
            urllib.request.urlretrieve(url, dst)
        except (urllib.error.URLError, OSError) as e:
            print(f'FAILED ({e}); fetch manually:\n  {url}')
            failed.append(url)
            continue
        if args.unzip:
            import shutil
            shutil.unpack_archive(dst, args.save_dir)
            if args.delete:
                os.remove(dst)
    sys.exit(1 if failed else 0)


if __name__ == '__main__':
    main()
