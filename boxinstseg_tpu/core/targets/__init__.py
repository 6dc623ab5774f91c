from .fcos import (FcosTargets, centerness_target, fcos_targets,
                   sample_positives_per_gt)

__all__ = ['FcosTargets', 'centerness_target', 'fcos_targets',
           'sample_positives_per_gt']
