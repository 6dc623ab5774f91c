from .assigner_zoo import (approx_max_iou_assign, atss_assign,
                           bbox_l1_cost, dice_cost, focal_loss_cost,
                           grid_assign, hungarian_bbox_assign, iou_cost,
                           point_assign, sim_ota_assign,
                           task_aligned_assign, uniform_assign)
from .assigners import (assign_wrt_overlaps, bbox_overlaps,
                        max_iou_assign, pseudo_sample, random_sample)
from .fcos import (FcosTargets, centerness_target, fcos_targets,
                   sample_positives_per_gt)
from .samplers import (combined_sample, instance_balanced_pos_sample,
                       iou_balanced_neg_sample, nms_match_groups,
                       ohem_sample, score_hlr_neg_sample)

__all__ = ['FcosTargets', 'centerness_target', 'fcos_targets',
           'sample_positives_per_gt', 'max_iou_assign', 'bbox_overlaps',
           'assign_wrt_overlaps', 'pseudo_sample', 'random_sample',
           'atss_assign', 'point_assign', 'grid_assign', 'uniform_assign',
           'task_aligned_assign', 'sim_ota_assign', 'approx_max_iou_assign',
           'hungarian_bbox_assign', 'focal_loss_cost', 'bbox_l1_cost',
           'iou_cost', 'dice_cost', 'instance_balanced_pos_sample',
           'iou_balanced_neg_sample', 'ohem_sample', 'score_hlr_neg_sample',
           'combined_sample', 'nms_match_groups']
