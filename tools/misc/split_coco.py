#!/usr/bin/env python
"""Split a COCO annotation file into labeled/unlabeled folds
(reference: tools/misc/split_coco.py surface — --data-root,
--labeled-percent, --fold; used for semi-/weakly-supervised recipes)."""
import argparse
import json
import os

import numpy as np


def split(ann_file, out_dir, percent, fold, seed):
    with open(ann_file) as f:
        data = json.load(f)
    rng = np.random.RandomState(seed + fold)
    img_ids = np.array([im['id'] for im in data['images']])
    n_lab = int(round(len(img_ids) * percent / 100.0))
    labeled = set(rng.permutation(img_ids)[:n_lab].tolist())

    def subset(keep):
        imgs = [im for im in data['images']
                if (im['id'] in labeled) == keep]
        ids = {im['id'] for im in imgs}
        anns = [a for a in data['annotations'] if a['image_id'] in ids]
        return dict(images=imgs, annotations=anns,
                    categories=data['categories'])

    base = os.path.splitext(os.path.basename(ann_file))[0]
    os.makedirs(out_dir, exist_ok=True)
    for name, keep in [('labeled', True), ('unlabeled', False)]:
        out = os.path.join(out_dir,
                           f'{base}.{fold}@{percent:g}.{name}.json')
        with open(out, 'w') as f:
            json.dump(subset(keep), f)
        print(f'-> {out}')


def main():
    p = argparse.ArgumentParser(description='Split COCO train data into '
                                            'labeled/unlabeled folds')
    p.add_argument('--data-root', required=True,
                   help='path to the annotation json to split')
    p.add_argument('--out-dir', default=None)
    p.add_argument('--labeled-percent', type=float, nargs='+',
                   default=[1, 2, 5, 10])
    p.add_argument('--fold', type=int, nargs='+', default=[1, 2, 3, 4, 5])
    p.add_argument('--seed', type=int, default=1)
    args = p.parse_args()
    out = args.out_dir or os.path.join(os.path.dirname(args.data_root),
                                       'semi_anns')
    for pct in args.labeled_percent:
        for fold in args.fold:
            split(args.data_root, out, pct, fold, args.seed)


if __name__ == '__main__':
    main()
