"""SOLO-style box-supervised detectors (reference:
mmdet/models/detectors/single_stage_boxseg.py + boxlevelset.py).

``predict`` emits fixed-capacity stride-4 mask scores; boxes are derived
from mask extents host-side during evaluation exactly like the
reference's ``format_results`` (single_stage_boxseg.py:75-90).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...registry import BACKBONES, DETECTORS, HEADS, NECKS
from ..layers import f32_tree


@DETECTORS.register_module()
class SingleStageBoxInsDetector(nn.Module):
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    bbox_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    def setup(self):
        self.backbone_m = BACKBONES.build(self.backbone)
        self.neck_m = NECKS.build(self.neck) if self.neck else None
        self.bbox_head_m = HEADS.build(self.bbox_head)

    def extract_feat(self, images, train: bool = False):
        x = self.backbone_m(images, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x, train=train)
        return x

    def __call__(self, images, train: bool = False):
        feats = self.extract_feat(images, train=train)
        return self.bbox_head_m(feats, train=train)

    def loss(self, batch: Dict[str, jnp.ndarray], iteration: jnp.ndarray
             ) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=True)
        # force_fp32 boundary: heads may run bf16; losses are f32
        outs = f32_tree(self.bbox_head_m(feats, train=True))
        return self.bbox_head_m.loss(outs, batch)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=False)
        outs = self.bbox_head_m(feats, train=False)
        return self.bbox_head_m.get_seg(outs, self.test_cfg)


@DETECTORS.register_module()
class BoxLevelSet(SingleStageBoxInsDetector):
    """Thin alias (reference: boxlevelset.py:5)."""
