"""Single-image inference (reference: mmdet/apis/inference.py:18-156
init_detector / inference_detector)."""
from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from ..config import Config
from ..data.batcher import StaticBatcher
from ..data.pipelines import Compose
from ..registry import build_detector
from .test import format_detection


def init_detector(config: Union[str, Config],
                  checkpoint: Optional[str] = None,
                  device=None):
    """Build a detector from a config file and optionally restore
    checkpointed variables. Returns (model, variables, cfg)."""
    import jax
    import jax.numpy as jnp
    from ..engine import init_variables, restore_checkpoint

    cfg = Config.fromfile(config) if isinstance(config, str) else config
    model = build_detector(cfg.model.copy() if hasattr(cfg.model, 'copy')
                           else dict(cfg.model))
    dummy = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = init_variables(model, {'params': jax.random.PRNGKey(0)},
                               dummy, False)
    if checkpoint is not None:
        if checkpoint.endswith('.pth'):
            # reference torch checkpoint -> converted variables (detector
            # family auto-detected from the state_dict key pattern)
            import torch
            from ..utils.checkpoint_convert import \
                convert_reference_checkpoint
            sd = torch.load(checkpoint, map_location='cpu',
                            weights_only=False)
            if 'state_dict' in sd:
                sd = sd['state_dict']
            params, stats = convert_reference_checkpoint(sd)
            from .train import _merge_pretrained
            variables = _merge_pretrained(variables, (params, stats))
        elif checkpoint.endswith('.msgpack'):
            # output of tools/model_converters/torch2jax.py: a msgpack
            # blob holding {'params', 'batch_stats'[, 'meta']} with the
            # converted reference weights (docs/ap_parity_runbook.md)
            from flax import serialization
            with open(checkpoint, 'rb') as f:
                blob = serialization.msgpack_restore(f.read())
            from .train import _merge_pretrained
            variables = _merge_pretrained(
                variables, (blob['params'], blob.get('batch_stats') or {}))
        else:
            import os
            if not os.path.isdir(checkpoint):
                raise FileNotFoundError(
                    f'checkpoint not found: {checkpoint}')
            restored = restore_checkpoint(checkpoint, None)
            if restored is not None and 'params' in restored:
                # orbax stores the full TrainState pytree; keep only the
                # apply collections (params + batch_stats)
                variables = {'params': restored['params']}
                if restored.get('batch_stats'):
                    variables['batch_stats'] = restored['batch_stats']
    return model, variables, cfg


def inference_detector(model, variables, cfg, img: Union[str, np.ndarray]):
    """Run the test pipeline + jitted predict on one image.

    Returns dict(bboxes (n,5), labels (n,), masks list of (oh, ow) uint8).
    """
    import jax
    import jax.numpy as jnp

    test_pipeline = cfg.get('test_pipeline')
    if test_pipeline is None:
        test_pipeline = cfg.data['test']['pipeline']
    pipeline = Compose(list(test_pipeline))

    results = {'bbox_fields': [], 'mask_fields': []}
    if isinstance(img, str):
        results['filename'] = img
    else:
        results['img'] = img
        results['filename'] = None
    results = pipeline(results)

    batcher = StaticBatcher(canvases=cfg.get(
        'canvases', [(800, 1344), (1344, 800)]), max_gts=1)
    batch = batcher([results])
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if k in ('image', 'img_shape', 'scale_factor')}
    out = jax.device_get(jax.jit(
        lambda v, b: model.apply(v, b, method=model.predict))(variables, jb))

    test_cfg = (cfg.model.get('test_cfg', {}) or {}) \
        if hasattr(cfg, 'model') else {}
    return format_detection(out, 0, batch['img_shape'][0],
                            batch['ori_shape'][0], test_cfg)
