"""boxinstseg_tpu: TPU-native (JAX/XLA/Pallas/pjit) box-supervised instance
segmentation toolbox with the capabilities of LiWentomng/BoxInstSeg."""

__version__ = '0.1.0'

from .config import Config, ConfigDict
from .registry import (BACKBONES, DATASETS, DETECTORS, HEADS, LOSSES, NECKS,
                       PIPELINES, build_backbone, build_dataset,
                       build_detector, build_head, build_loss, build_neck)


def _register_all():
    """Import submodules for their registration side effects."""
    from . import models  # noqa: F401
    from . import data    # noqa: F401


_register_all()
