"""Test-only oracle: an independent, faithful transcription of the
pycocotools COCOeval protocol (cocodataset/cocoapi, cocoeval.py) used to
validate boxinstseg_tpu.core.eval.coco_eval against the evaluator the
reference toolbox actually runs (reference: mmdet/datasets/coco.py:386-649
-> pycocotools.cocoeval.COCOeval).

pycocotools is not installable in this environment, so this module
re-derives the exact protocol from the published algorithm, structured the
same way (computeIoU per (img, cat) -> evaluateImg per (img, cat, areaRng)
-> accumulate -> summarize) but written dict-at-a-time in plain numpy with
no code shared with the package under test. Deliberately slow and literal.

Semantics transcribed (the corner cases that reimplementations typically
get wrong):
  * gt ignore flag = annotation 'ignore' OR 'iscrowd'; within evaluateImg
    the area-range filter is folded into a per-call '_ignore' and gts are
    re-sorted ignore-last PER AREA RANGE (stable mergesort), with the iou
    matrix columns permuted to match.
  * greedy matching per IoU threshold in detection-score order: an already
    matched non-crowd gt is skipped; iteration breaks at the first ignored
    gt once a non-ignored match is held; ties on IoU are won by the LAST
    gt reaching the running-best IoU (>= comparison).
  * crowd gts may match any number of detections; IoU against a crowd gt
    uses union = area(dt).
  * unmatched detections whose area falls outside the range are ignored
    (not counted as FP); matched detections inherit the gt ignore flag.
  * detections are truncated to maxDets[-1] inside evaluateImg and
    re-truncated per maxDet inside accumulate, both AFTER stable score
    sort (mergesort, so input order breaks score ties).
  * detection 'area' for the area-range filter follows loadRes: mask area
    for segm, box w*h for bbox.
  * accumulate: scores merged across images and re-sorted (stable),
    tp/(tp+fp+spacing) precision, monotone non-increasing interpolation
    (reverse running max), precision sampled at 101 recall thresholds via
    searchsorted(side='left'); recall = final recall; cells with no gt
    stay -1 and are excluded from the summary means.

One documented ambiguity: official cocoapi overwrites gt['ignore'] with
iscrowd in _prepare (cocodataset/cocoapi#333); datasets that feed COCOeval
through the reference stack (mmdet coco.py) never carry an 'ignore' key,
so the two readings coincide on every real input. This oracle uses
(ignore OR iscrowd), the reading every downstream fork implements.

Input format (no COCO-json plumbing, dense masks instead of RLE so the
package's RLE codec is independently exercised by the caller):
  gt ann:  dict(image_id, category_id, bbox=[x,y,w,h], area, iscrowd,
                ignore (optional), mask=(h,w) uint8 (segm only))
  dt:      dict(image_id, category_id, bbox=[x,y,w,h], score,
                mask=(h,w) uint8 (segm only))
"""
from __future__ import annotations

import numpy as np


def _dense_iou_masks(d_masks, g_masks, iscrowd):
    out = np.zeros((len(d_masks), len(g_masks)))
    for i, dm in enumerate(d_masks):
        df = dm.reshape(-1).astype(np.float64)
        da = df.sum()
        for j, gm in enumerate(g_masks):
            gf = gm.reshape(-1).astype(np.float64)
            inter = float(df @ gf)
            union = da if iscrowd[j] else da + gf.sum() - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def _iou_boxes(d_boxes, g_boxes, iscrowd):
    out = np.zeros((len(d_boxes), len(g_boxes)))
    for i, d in enumerate(d_boxes):
        dx1, dy1, dw, dh = d
        da = dw * dh
        for j, g in enumerate(g_boxes):
            gx1, gy1, gw, gh = g
            iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
            ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
            inter = max(iw, 0.0) * max(ih, 0.0)
            union = da if iscrowd[j] else da + gw * gh - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


class OracleCOCOeval:
    """Mirror of pycocotools.cocoeval.COCOeval for iouType bbox/segm."""

    def __init__(self, gt_anns, dt_anns, img_ids, cat_ids, iou_type):
        self.iouType = iou_type
        self.imgIds = list(img_ids)
        self.catIds = list(cat_ids)
        self.iouThrs = np.linspace(.5, 0.95,
                                   int(np.round((0.95 - .5) / .05)) + 1)
        self.recThrs = np.linspace(.0, 1.00,
                                   int(np.round((1.00 - .0) / .01)) + 1)
        self.maxDets = [1, 10, 100]
        self.areaRng = [[0 ** 2, 1e5 ** 2], [0 ** 2, 32 ** 2],
                        [32 ** 2, 96 ** 2], [96 ** 2, 1e5 ** 2]]
        self.areaRngLbl = ['all', 'small', 'medium', 'large']

        self._gts = {(i, c): [] for i in self.imgIds for c in self.catIds}
        self._dts = {(i, c): [] for i in self.imgIds for c in self.catIds}
        for ann in gt_anns:
            g = dict(ann)
            # _prepare: ignore flag (see module docstring re #333)
            g['ignore'] = bool(g.get('ignore', 0)) or bool(
                g.get('iscrowd', 0))
            self._gts[(g['image_id'], g['category_id'])].append(g)
        for ann in dt_anns:
            d = dict(ann)
            # loadRes: detection area = mask area (segm) / box area (bbox)
            if iou_type == 'segm':
                d['area'] = float(d['mask'].sum())
            else:
                d['area'] = float(d['bbox'][2] * d['bbox'][3])
            self._dts[(d['image_id'], d['category_id'])].append(d)

    # -------------------------------------------------- computeIoU
    def computeIoU(self, imgId, catId):
        gt = self._gts[(imgId, catId)]
        dt = self._dts[(imgId, catId)]
        if len(gt) == 0 and len(dt) == 0:
            return np.zeros((0, 0))
        inds = np.argsort([-d['score'] for d in dt], kind='mergesort')
        dt = [dt[i] for i in inds]
        if len(dt) > self.maxDets[-1]:
            dt = dt[0:self.maxDets[-1]]
        iscrowd = [int(o.get('iscrowd', 0)) for o in gt]
        if self.iouType == 'segm':
            return _dense_iou_masks([d['mask'] for d in dt],
                                    [g['mask'] for g in gt], iscrowd)
        return _iou_boxes([d['bbox'] for d in dt],
                          [g['bbox'] for g in gt], iscrowd)

    # -------------------------------------------------- evaluateImg
    def evaluateImg(self, imgId, catId, aRng, maxDet, ious):
        gt = self._gts[(imgId, catId)]
        dt = self._dts[(imgId, catId)]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            if g['ignore'] or (g['area'] < aRng[0] or g['area'] > aRng[1]):
                g['_ignore'] = 1
            else:
                g['_ignore'] = 0
        # sort dt highest score first, sort gt ignore last
        gtind = np.argsort([g['_ignore'] for g in gt], kind='mergesort')
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d['score'] for d in dt], kind='mergesort')
        dt = [dt[i] for i in dtind[0:maxDet]]
        iscrowd = [int(o.get('iscrowd', 0)) for o in gt]
        ious = ious[:, gtind] if len(ious) > 0 else ious

        T = len(self.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g['_ignore'] for g in gt])
        dtIg = np.zeros((T, D))
        if not len(ious) == 0:
            for tind, t in enumerate(self.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        # gt already matched, and not a crowd: continue
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        # dt matched to reg gt, and on ignore gt: stop
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        # continue to next gt unless better match made
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = 1 + m   # pycocotools stores gt id
                    gtm[tind, m] = 1 + dind   # (any nonzero marker works)
        # set unmatched detections outside of area range to ignore
        a = np.array([d['area'] < aRng[0] or d['area'] > aRng[1]
                      for d in dt]).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(
            dtm == 0, np.repeat(a, T, 0)))
        return {
            'dtMatches': dtm,
            'dtScores': [d['score'] for d in dt],
            'gtIgnore': gtIg,
            'dtIgnore': dtIg,
        }

    # -------------------------------------------------- accumulate
    def evaluate_and_accumulate(self):
        ious = {(imgId, catId): self.computeIoU(imgId, catId)
                for imgId in self.imgIds for catId in self.catIds}
        maxDet = self.maxDets[-1]
        evalImgs = {}
        for catId in self.catIds:
            for a_i, aRng in enumerate(self.areaRng):
                for imgId in self.imgIds:
                    evalImgs[(imgId, catId, a_i)] = self.evaluateImg(
                        imgId, catId, aRng, maxDet, ious[(imgId, catId)])

        T = len(self.iouThrs)
        R = len(self.recThrs)
        K = len(self.catIds)
        A = len(self.areaRng)
        M = len(self.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        for k, catId in enumerate(self.catIds):
            for a in range(A):
                E = [evalImgs[(imgId, catId, a)] for imgId in self.imgIds]
                E = [e for e in E if e is not None]
                if len(E) == 0:
                    continue
                for m, maxDet in enumerate(self.maxDets):
                    dtScores = np.concatenate(
                        [e['dtScores'][0:maxDet] for e in E])
                    inds = np.argsort(-dtScores, kind='mergesort')
                    dtm = np.concatenate(
                        [e['dtMatches'][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    dtIg = np.concatenate(
                        [e['dtIgnore'][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    gtIg = np.concatenate([e['gtIgnore'] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(
                        np.logical_not(dtm), np.logical_not(dtIg))
                    tp_sum = np.cumsum(tps, axis=1).astype(dtype=float)
                    fp_sum = np.cumsum(fps, axis=1).astype(dtype=float)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        tp = np.array(tp)
                        fp = np.array(fp)
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        if nd:
                            recall[t, k, a, m] = rc[-1]
                        else:
                            recall[t, k, a, m] = 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, self.recThrs,
                                               side='left')
                        try:
                            for ri, pi in enumerate(inds):
                                q[ri] = pr[pi]
                        except IndexError:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
        self.eval = dict(precision=precision, recall=recall)
        return self.eval

    # -------------------------------------------------- summarize
    def summarize(self):
        def _summarize(ap=1, iouThr=None, areaRng='all', maxDets=100):
            aind = [i for i, a in enumerate(self.areaRngLbl)
                    if a == areaRng]
            mind = [i for i, m in enumerate(self.maxDets) if m == maxDets]
            if ap == 1:
                s = self.eval['precision']
                if iouThr is not None:
                    t = np.where(iouThr == self.iouThrs)[0]
                    s = s[t]
                s = s[:, :, :, aind, mind]
            else:
                s = self.eval['recall']
                if iouThr is not None:
                    t = np.where(iouThr == self.iouThrs)[0]
                    s = s[t]
                s = s[:, :, aind, mind]
            if len(s[s > -1]) == 0:
                return -1.0
            return float(np.mean(s[s > -1]))

        stats = np.zeros((12,))
        stats[0] = _summarize(1)
        stats[1] = _summarize(1, iouThr=.5, maxDets=self.maxDets[2])
        stats[2] = _summarize(1, iouThr=.75, maxDets=self.maxDets[2])
        stats[3] = _summarize(1, areaRng='small', maxDets=self.maxDets[2])
        stats[4] = _summarize(1, areaRng='medium', maxDets=self.maxDets[2])
        stats[5] = _summarize(1, areaRng='large', maxDets=self.maxDets[2])
        stats[6] = _summarize(0, maxDets=self.maxDets[0])
        stats[7] = _summarize(0, maxDets=self.maxDets[1])
        stats[8] = _summarize(0, maxDets=self.maxDets[2])
        stats[9] = _summarize(0, areaRng='small', maxDets=self.maxDets[2])
        stats[10] = _summarize(0, areaRng='medium',
                               maxDets=self.maxDets[2])
        stats[11] = _summarize(0, areaRng='large', maxDets=self.maxDets[2])
        return stats
