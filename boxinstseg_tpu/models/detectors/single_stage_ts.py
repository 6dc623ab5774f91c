"""DiscoBox teacher-student detector (reference:
mmdet/models/detectors/single_stage_ts.py, 242 LoC).

The reference keeps a full teacher module copy updated by a state_dict EMA
loop and gates losses on a python-side running float. Here the teacher is
an EMA parameter replica living in the TrainState (updated inside the
jitted step) and ``avg_loss_ins`` is a traced scalar; gates are
multiplicative, so one compiled program covers warmup and gated phases.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...registry import BACKBONES, DETECTORS, HEADS, NECKS
from ..layers import f32_tree


@DETECTORS.register_module()
class SingleStageWSInsDetector(nn.Module):
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    bbox_head: Optional[dict] = None
    mask_feat_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    def setup(self):
        self.backbone_m = BACKBONES.build(self.backbone)
        self.neck_m = NECKS.build(self.neck) if self.neck else None
        self.bbox_head_m = HEADS.build(self.bbox_head)
        self.mask_feat_head_m = HEADS.build(self.mask_feat_head)

    def extract_feat(self, images, train: bool = False):
        x = self.backbone_m(images, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x, train=train)
        return x

    def _mask_feat_inputs(self, feats):
        s = self.mask_feat_head.get('start_level', 0)
        e = self.mask_feat_head.get('end_level', 3)
        return feats[s:e + 1]

    def __call__(self, images, train: bool = False):
        feats = self.extract_feat(images, train=train)
        outs = self.bbox_head_m(feats, train=train)
        mask_feat = self.mask_feat_head_m(self._mask_feat_inputs(feats),
                                          train=train)
        return outs, mask_feat

    def teacher_outputs(self, images) -> Dict[str, jnp.ndarray]:
        """Raw kernels + mask feature for the EMA replica (applied with
        teacher variables by the train step; reference teacher forward at
        single_stage_ts.py:195-199)."""
        feats = self.extract_feat(images, train=False)
        outs = self.bbox_head_m(feats, train=True)  # logits, no points-nms
        mask_feat = self.mask_feat_head_m(self._mask_feat_inputs(feats),
                                          train=False)
        return dict(kernels=outs['kernels'], mask_feat=mask_feat,
                    p2=feats[0])

    def loss(self, batch: Dict[str, jnp.ndarray], iteration: jnp.ndarray,
             teacher_out: Optional[Dict] = None,
             gates: Optional[Dict] = None,
             bank=None) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=True)
        # force_fp32 boundary: heads may run bf16; losses are f32
        outs = f32_tree(self.bbox_head_m(feats, train=True))
        mask_feat = f32_tree(self.mask_feat_head_m(
            self._mask_feat_inputs(feats), train=True))
        feats = f32_tree(feats)   # p2 feeds the correspondence loss
        gates = gates or {}
        teacher = None
        t_feat = None
        if teacher_out is not None:
            tg = gates.get('teacher', jnp.float32(0.0))
            # blend: before turn-on the reference uses the student itself
            teacher = dict(
                kernels=tg * teacher_out['kernels']
                + (1.0 - tg) * jax.lax.stop_gradient(outs['kernels']),
                mask_feat=tg * teacher_out['mask_feat']
                + (1.0 - tg) * jax.lax.stop_gradient(mask_feat))
            if 'p2' in teacher_out:
                t_feat = tg * teacher_out['p2'] + (1.0 - tg) * \
                    jax.lax.stop_gradient(feats[0])
        return self.bbox_head_m.loss(
            outs, mask_feat, batch, teacher=teacher,
            use_ts_gate=gates.get('ts'),
            corr_gate=gates.get('corr'),
            bank=bank, s_feat=feats[0], t_feat=t_feat)

    def predict(self, batch: Dict[str, jnp.ndarray]
                ) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=False)
        outs = self.bbox_head_m(feats, train=False)
        mask_feat = self.mask_feat_head_m(self._mask_feat_inputs(feats),
                                          train=False)
        return self.bbox_head_m.get_seg(outs, mask_feat, self.test_cfg)


@DETECTORS.register_module()
class SingleStageWSInsTSDetector(SingleStageWSInsDetector):
    """Teacher-student variant; the EMA replica is engine-managed."""

    @property
    def use_ind_teacher(self) -> bool:
        return bool(((self.bbox_head or {}).get('loss_ts') or {}).get(
            'use_ind_teacher', False))

    @property
    def teacher_momentum(self) -> float:
        return float(((self.bbox_head or {}).get('loss_ts') or {}).get(
            'momentum', 0.999))


@DETECTORS.register_module()
class DiscoBoxSOLOv2(SingleStageWSInsTSDetector):
    """Thin alias (reference: discobox.py:16)."""
