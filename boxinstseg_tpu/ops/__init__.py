from .anchors import (AnchorGenerator, LegacyAnchorGenerator,
                      LegacySSDAnchorGenerator, SSDAnchorGenerator,
                      YOLOAnchorGenerator)
from .boxes import (aligned_iou, bbox2distance, bbox_area, bbox_overlaps,
                    distance2bbox)
from .color import (image_color_similarity, neighbor_offsets, shift2d,
                    srgb_to_lab, srgb_uint8_to_lab)
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
    'interpolate_bilinear', 'AnchorGenerator', 'SSDAnchorGenerator',
    'LegacyAnchorGenerator', 'LegacySSDAnchorGenerator',
    'YOLOAnchorGenerator',
]
