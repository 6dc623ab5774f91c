from .anchors import (AnchorGenerator, LegacyAnchorGenerator,
                      LegacySSDAnchorGenerator, SSDAnchorGenerator,
                      YOLOAnchorGenerator)
from .boxes import (aligned_iou, bbox2distance, bbox_area, bbox_overlaps,
                    distance2bbox)
from .color import (image_color_similarity, neighbor_offsets, shift2d,
                    srgb_to_lab, srgb_uint8_to_lab)
from .merge_augs import (bbox_flip, bbox_mapping, bbox_mapping_back,
                         merge_aug_bboxes, merge_aug_masks,
                         merge_aug_proposals, merge_aug_scores)
from .nms import greedy_nms, mask_matrix_nms, points_nms_2x2
from .pairwise import (boxinst_pairwise_loss, compute_pairwise_term,
                       pairwise_loss)
from .points import concat_points_and_meta, level_points, multi_level_points
from .upsample import aligned_bilinear, avg_pool_stride, interpolate_bilinear

__all__ = [
    'aligned_iou', 'bbox2distance', 'bbox_area', 'bbox_overlaps',
    'distance2bbox', 'image_color_similarity', 'neighbor_offsets', 'shift2d',
    'srgb_to_lab', 'srgb_uint8_to_lab', 'greedy_nms', 'mask_matrix_nms',
    'points_nms_2x2', 'boxinst_pairwise_loss', 'compute_pairwise_term',
    'pairwise_loss', 'concat_points_and_meta', 'level_points',
    'multi_level_points', 'aligned_bilinear', 'avg_pool_stride',
    'interpolate_bilinear', 'bbox_flip', 'bbox_mapping',
    'bbox_mapping_back', 'merge_aug_bboxes', 'merge_aug_masks',
    'merge_aug_proposals', 'merge_aug_scores',
    'AnchorGenerator', 'SSDAnchorGenerator',
    'LegacyAnchorGenerator', 'LegacySSDAnchorGenerator',
    'YOLOAnchorGenerator',
]
