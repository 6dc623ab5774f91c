"""Evaluation loop (reference: mmdet/apis/test.py single_gpu_test +
CocoDataset.evaluate).

The device side is one jitted ``predict`` over fixed-capacity detections;
the host side crops/rescales stride-4 mask scores to each image's original
resolution and RLE-encodes them (mirroring the reference's GPU->CPU mask
handoff, condinst_head.py:1281-1283 and encode_mask_results,
apis/test.py:64-66).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..data.batcher import StaticBatcher
from ..data.coco_api import rle_encode
from ..data.loader import EvalLoader
from ..utils.logging import get_root_logger


def _aligned_upsample_np(x: np.ndarray, factor: int) -> np.ndarray:
    """numpy twin of ops.upsample.aligned_bilinear for (H, W) arrays."""
    h, w = x.shape

    def axis_idx(n):
        out = np.arange(n * factor)
        i = np.maximum(out - factor // 2, 0)
        q = i // factor
        r = (i % factor).astype(np.float32) / factor
        return np.clip(q, 0, n - 1), np.clip(q + 1, 0, n - 1), r

    q0, q1, r = axis_idx(h)
    x = (1 - r)[:, None] * x[q0] + r[:, None] * x[q1]
    q0, q1, r = axis_idx(w)
    x = (1 - r)[None, :] * x[:, q0] + r[None, :] * x[:, q1]
    return x


def postprocess_masks(mask_scores: np.ndarray, img_shape, ori_shape,
                      out_stride: int = 4, thresh: float = 0.5,
                      aligned: bool = True) -> List[np.ndarray]:
    """(D, H/s, W/s) sigmoid scores on the padded canvas -> list of
    (ori_h, ori_w) uint8 masks (reference: CondInstMaskHead.simple_test
    resize-crop-threshold chain)."""
    import cv2
    ih, iw = int(img_shape[0]), int(img_shape[1])
    oh, ow = int(ori_shape[0]), int(ori_shape[1])
    out = []
    for m in mask_scores:
        if aligned:
            full = _aligned_upsample_np(m.astype(np.float32), out_stride)
        else:  # SOLO path: plain bilinear x4 (reference get_seg_single)
            full = cv2.resize(m.astype(np.float32), None, fx=out_stride,
                              fy=out_stride, interpolation=cv2.INTER_LINEAR)
        full = full[:ih, :iw]
        full = cv2.resize(full, (ow, oh), interpolation=cv2.INTER_LINEAR)
        out.append((full > thresh).astype(np.uint8))
    return out


def format_detection(out: Dict, i: int, img_shape, ori_shape,
                     test_cfg: Optional[Dict] = None):
    """Format one image's device ``predict`` output into host results.

    Handles both output families: FCOS-style (CondInst: has 'bboxes') and
    SOLO/Box2Mask-style (masks only — boxes recovered from mask extents,
    reference format_results, single_stage_boxseg.py:75-90).
    Returns an ``InstanceData`` (reference: core/data_structures/
    instance_data.py) with bboxes (n,5) incl. score, labels (n,), masks
    list of (oh, ow) uint8 — field access by name or row indexing.
    """
    valid = out['valid'][i]
    labels = out['labels'][i][valid]
    scores = out['scores'][i][valid]
    pan_results = None
    if 'pan_cls' in out and (test_cfg or {}).get('panoptic_on', False):
        # finish the panoptic fusion at original resolution (reference
        # maskformer_fusion_head.py simple_test :211-226 interpolates
        # the per-query logits to ori_shape, then panoptic_postprocess)
        import cv2
        from ..models.detectors.maskformer import panoptic_postprocess
        ih, iw = int(img_shape[0]), int(img_shape[1])
        oh, ow = int(ori_shape[0]), int(ori_shape[1])
        ups = []
        for m in np.asarray(out['pan_masks_logit'][i], np.float32):
            full = cv2.resize(m, None, fx=4, fy=4,
                              interpolation=cv2.INTER_LINEAR)[:ih, :iw]
            ups.append(cv2.resize(full, (ow, oh),
                                  interpolation=cv2.INTER_LINEAR))
        fusion = dict(test_cfg.get('panoptic_fusion', {}))
        pan_results = np.asarray(panoptic_postprocess(
            np.asarray(out['pan_cls'][i], np.float32),
            np.stack(ups),
            num_things_classes=int(fusion.get('num_things_classes', 80)),
            num_stuff_classes=int(fusion.get('num_stuff_classes', 53)),
            object_mask_thr=float(test_cfg.get('object_mask_thr', 0.8)),
            iou_thr=float(test_cfg.get('iou_thr', 0.8)),
            filter_low_score=bool(test_cfg.get('filter_low_score',
                                               False))))
    if 'masks_logit' in out:
        # MaskFormer/Box2Mask family: finish the reference fusion-head
        # chain on the host — interpolate LOGITS to padded input res,
        # crop img_shape, rescale to ori_shape, binarize at logits>0,
        # rescore at ORIGINAL resolution (maskformer_fusion_head.py:
        # simple_test :200-232 then instance_postprocess :112-162)
        import cv2
        ih, iw = int(img_shape[0]), int(img_shape[1])
        oh, ow = int(ori_shape[0]), int(ori_shape[1])
        masks, mask_scores = [], []
        for m in np.asarray(out['masks_logit'][i][valid], np.float32):
            full = cv2.resize(m, None, fx=4, fy=4,
                              interpolation=cv2.INTER_LINEAR)[:ih, :iw]
            full = cv2.resize(full, (ow, oh),
                              interpolation=cv2.INTER_LINEAR)
            binary = full > 0
            pos = binary.sum()
            sig = 1.0 / (1.0 + np.exp(-full))
            mask_scores.append((sig * binary).sum() / (pos + 1e-6))
            masks.append(binary.astype(np.uint8))
        scores = scores * np.asarray(mask_scores, scores.dtype)
        # empty masks get score 0 in the reference; we drop them (their
        # RLE is empty and they cannot match anything in COCOeval)
        nonempty = np.array([m.any() for m in masks], bool)
        labels, scores = labels[nonempty], scores[nonempty]
        masks = [m for m, k in zip(masks, nonempty) if k]
        is_solo = True
    else:
        is_solo = 'bboxes' not in out
        thresh = float((test_cfg or {}).get('mask_thr', 0.5)) \
            if is_solo else 0.5
        masks_s = out['masks'][i][valid]
        masks = postprocess_masks(masks_s, img_shape, ori_shape,
                                  thresh=thresh, aligned=not is_solo)
    if not is_solo:
        boxes = np.concatenate([out['bboxes'][i][valid], scores[:, None]], -1)
    else:
        boxes = np.zeros((len(masks), 5), np.float64)
        for d, m in enumerate(masks):
            ys, xs = np.nonzero(m)
            if len(ys):
                boxes[d, :4] = [xs.min(), ys.min(), xs.max() + 1,
                                ys.max() + 1]
            boxes[d, 4] = scores[d]
    from ..core.structures import InstanceData
    meta = dict(img_shape=tuple(int(v) for v in img_shape),
                ori_shape=tuple(int(v) for v in ori_shape))
    if pan_results is not None:
        meta['pan_results'] = pan_results
    return InstanceData(
        metainfo=meta,
        bboxes=boxes.astype(np.float64),
        labels=labels.astype(np.int64), masks=masks)


def collect_results_cpu(result_part: List, part_indices: List[int],
                        size: int, tmpdir: str) -> Optional[List]:
    """Cross-process eval result collection (reference multi_gpu_test ->
    collect_results_cpu, mmdet/apis/test.py:81-178): every process
    pickles its (indices, results) part into a shared tmpdir, a global
    device barrier replaces dist.barrier(), and process 0 merges by
    dataset index. Returns the merged list on process 0, None elsewhere.
    """
    import pickle
    import shutil

    import jax
    from jax.experimental import multihost_utils

    os.makedirs(tmpdir, exist_ok=True)
    part_file = os.path.join(tmpdir, f'part_{jax.process_index()}.pkl')
    with open(part_file, 'wb') as f:
        pickle.dump((part_indices, result_part), f)
    multihost_utils.sync_global_devices('boxinstseg_eval_parts_written')
    merged = None
    if jax.process_index() == 0:
        merged = [None] * size
        for p in range(jax.process_count()):
            with open(os.path.join(tmpdir, f'part_{p}.pkl'), 'rb') as f:
                inds, part = pickle.load(f)
            for i, r in zip(inds, part):
                merged[i] = r
        missing = [i for i, r in enumerate(merged) if r is None]
        assert not missing, f'eval gather missing indices {missing[:8]}'
    # all parts read before anyone may delete / exit
    multihost_utils.sync_global_devices('boxinstseg_eval_parts_read')
    if jax.process_index() == 0:
        shutil.rmtree(tmpdir, ignore_errors=True)
    return merged


def run_evaluation(model, variables, dataset, cfg,
                   metrics=('bbox', 'segm'), max_images: Optional[int] = None,
                   batch_size: Optional[int] = None,
                   save_results: Optional[str] = None) -> Dict[str, float]:
    """Evaluate ``dataset``; under multi-process JAX the dataset is
    sharded across processes and results are gathered to process 0
    (reference: single_gpu_test/multi_gpu_test). Returns the metric dict
    on process 0 and {} on other processes."""
    import jax
    import jax.numpy as jnp

    from .train import apply_precision_policy
    apply_precision_policy(cfg)
    logger = get_root_logger()
    data_cfg = cfg.get('data', {}) if hasattr(cfg, 'get') else {}
    b = batch_size or data_cfg.get('samples_per_gpu', 2)
    mask_head_cfg = (cfg.model.get('mask_head', {}) or {}) \
        if hasattr(cfg, 'model') else {}
    batcher = StaticBatcher(
        canvases=cfg.get('canvases', [(800, 1344), (1344, 800)])
        if hasattr(cfg, 'get') else [(800, 1344), (1344, 800)],
        max_gts=1,  # annotations unused at test time
        bottom_pixels_removed=mask_head_cfg.get('bottom_pixels_removed', 10))
    rank, nproc = jax.process_index(), jax.process_count()
    n_total = len(dataset) if max_images is None \
        else min(max_images, len(dataset))
    # rank r evaluates every nproc-th image (reference per-rank shard).
    # Shards are padded to EQUAL length: the jitted predict over the
    # globally-replicated variables is a lockstep multi-process program,
    # so every process must run the same number of batches; duplicate
    # indices just overwrite identical entries at gather time.
    my_indices = list(range(rank, n_total, nproc))
    per = (n_total + nproc - 1) // nproc
    while len(my_indices) < per:
        my_indices.append(my_indices[-1] if my_indices
                          else rank % max(n_total, 1))
    loader = EvalLoader(dataset, b, batcher, indices=my_indices)

    @jax.jit
    def predict(variables, batch):
        return model.apply(variables, batch, method=model.predict)

    results = []
    n_done = 0
    for batch, real, metas in loader:
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k in ('image', 'img_shape', 'scale_factor')}
        out = jax.device_get(predict(variables, jb))
        test_cfg = dict((cfg.model.get('test_cfg', {}) or {})
                        if hasattr(cfg, 'model') else {})
        if hasattr(cfg, 'model') and cfg.model.get('panoptic_fusion_head'):
            # class split for the host-side panoptic fusion (reference
            # builds the fusion head from this config node)
            test_cfg['panoptic_fusion'] = dict(
                cfg.model['panoptic_fusion_head'])
        for i in range(real):
            det = format_detection(out, i, metas[i]['img_shape'][:2],
                                   metas[i]['ori_shape'][:2], test_cfg)
            rec = dict(
                bboxes=det['bboxes'], labels=det['labels'],
                masks=[rle_encode(m) for m in det['masks']])
            if 'pan_results' in det.metainfo:
                rec['pan_results'] = det.metainfo['pan_results']
            results.append(rec)
        n_done += real
        if n_done % (20 * b) < b:
            logger.info(f'eval: {n_done}/{len(my_indices)} (proc {rank})')

    if nproc > 1:
        # like the reference's collect_results_cpu tmpdir, this path must
        # be VISIBLE TO ALL PROCESSES (shared filesystem); override with
        # cfg.eval_tmpdir when work_dir is per-process
        default = os.path.join(cfg.get('work_dir', '.')
                               if hasattr(cfg, 'get') else '.',
                               '.eval_gather')
        tmpdir = (cfg.get('eval_tmpdir') if hasattr(cfg, 'get')
                  else None) or default
        results = collect_results_cpu(results, my_indices, n_total, tmpdir)
        if rank != 0:
            return {}
    if save_results:
        import json
        with open(save_results, 'w') as f:
            json.dump([dict(bboxes=r['bboxes'].tolist(),
                            labels=r['labels'].tolist(),
                            masks=r['masks']) for r in results], f)
    if max_images is not None:
        # trim dataset img ids for partial eval
        from ..core.eval.coco_eval import evaluate_coco
        return evaluate_coco(dataset.coco, dataset.img_ids[:len(results)],
                             dataset.cat_ids, results, list(metrics))
    return dataset.evaluate(results, metric=list(metrics))
