"""MaskFormer-style detector + Box2Mask alias + fusion post-processing
(reference: mmdet/models/detectors/maskformer.py, box2mask.py, and
mmdet/models/seg_heads/panoptic_fusion_heads/maskformer_fusion_head.py —
only the instance branch is exercised by Box2Mask, :112-162)."""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...registry import BACKBONES, DETECTORS, HEADS, NECKS
from ..layers import f32_tree


def instance_postprocess(mask_cls: jnp.ndarray, mask_pred: jnp.ndarray,
                         max_per_image: int = 100) -> Dict[str, jnp.ndarray]:
    """Query outputs -> fixed-capacity instance candidates (reference
    MaskFormerFusionHead.instance_postprocess, the device half):
    flattened (query, class) top-k on softmax scores + the matching mask
    LOGITS. Mask binarization (logits > 0) and mask rescoring happen on
    the host at ORIGINAL resolution (``format_detection``), exactly like
    the reference, which interpolates logits to ori_shape BEFORE
    instance_postprocess (maskformer_fusion_head.py:200-232,112-162).

    mask_cls: (B, Q, C+1); mask_pred: (B, Q, H4, W4) logits.
    """
    b, q, cp1 = mask_cls.shape
    c = cp1 - 1
    scores = jax.nn.softmax(mask_cls, axis=-1)[..., :-1]    # (B, Q, C)
    flat = scores.reshape(b, q * c)
    k = min(max_per_image, q * c)
    top_scores, top_idx = jax.lax.top_k(flat, k)
    labels = (top_idx % c).astype(jnp.int32)
    query_idx = top_idx // c
    masks_logit = jnp.take_along_axis(
        mask_pred, query_idx[..., None, None], axis=1)      # (B, k, H, W)
    return dict(scores=top_scores, labels=labels,
                masks_logit=masks_logit,
                valid=jnp.ones_like(top_scores, bool))


@DETECTORS.register_module()
class MaskFormer(nn.Module):
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    panoptic_head: Optional[dict] = None
    panoptic_fusion_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    def setup(self):
        self.backbone_m = BACKBONES.build(self.backbone)
        self.neck_m = NECKS.build(self.neck) if self.neck else None
        head_cfg = dict(self.panoptic_head)
        head_cfg['train_cfg'] = self.train_cfg
        head_cfg['test_cfg'] = self.test_cfg
        self.panoptic_head_m = HEADS.build(head_cfg)

    def extract_feat(self, images, train: bool = False):
        x = self.backbone_m(images, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x, train=train)
        return x

    def __call__(self, images, train: bool = False):
        feats = self.extract_feat(images, train=train)
        return self.panoptic_head_m(feats, train=train)

    def loss(self, batch: Dict[str, jnp.ndarray], iteration: jnp.ndarray
             ) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=True)
        # force_fp32 boundary: heads may run bf16; losses are f32
        outs = f32_tree(self.panoptic_head_m(feats, train=True))
        return self.panoptic_head_m.loss(outs, batch)

    def predict(self, batch: Dict[str, jnp.ndarray]
                ) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=False)
        outs = self.panoptic_head_m(feats, train=False)
        max_per_image = int((self.test_cfg or {}).get('max_per_image', 100))
        return instance_postprocess(outs['cls'][-1], outs['masks'][-1],
                                    max_per_image)


@DETECTORS.register_module()
class Box2Mask(MaskFormer):
    """Thin alias (reference: box2mask.py:6)."""
