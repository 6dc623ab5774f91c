from .assigners import (bbox_overlaps, max_iou_assign, pseudo_sample,
                        random_sample)
from .fcos import (FcosTargets, centerness_target, fcos_targets,
                   sample_positives_per_gt)

__all__ = ['FcosTargets', 'centerness_target', 'fcos_targets',
           'sample_positives_per_gt', 'max_iou_assign', 'bbox_overlaps',
           'pseudo_sample', 'random_sample']
