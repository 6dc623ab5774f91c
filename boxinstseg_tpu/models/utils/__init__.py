from .bricks import (ConvUpsample, DyReLU, InvertedResidual, NormedConv2d,
                     NormedLinear, SELayer, SimplifiedBasicBlock,
                     adaptive_avg_pool2d, interpolate_as, make_divisible,
                     scale_target, sigmoid_geometric_mean)
from .gaussian_target import (gather_feat, gaussian2D, gaussian_radius,
                              gen_gaussian_target, get_local_maximum,
                              get_topk_from_heatmap,
                              transpose_and_gather_feat)
from .point_sample import (get_uncertain_point_coords_with_randomness,
                           get_uncertainty, point_sample)
from .positional_encoding import (LearnedPositionalEncoding,
                                  SinePositionalEncoding)
from .transformer import (FFN, DetrTransformerDecoder,
                          DetrTransformerDecoderLayer,
                          DetrTransformerEncoder,
                          DetrTransformerEncoderLayer, DynamicConv,
                          MultiheadAttention,
                          MultiScaleDeformableAttention,
                          TransformerEncoderLayer)

__all__ = ['SinePositionalEncoding', 'LearnedPositionalEncoding', 'FFN',
           'DetrTransformerDecoderLayer', 'DetrTransformerEncoderLayer',
           'DetrTransformerEncoder', 'DetrTransformerDecoder',
           'TransformerEncoderLayer', 'DynamicConv', 'MultiheadAttention',
           'MultiScaleDeformableAttention',
           'SELayer', 'DyReLU', 'InvertedResidual', 'NormedLinear',
           'NormedConv2d', 'ConvUpsample', 'SimplifiedBasicBlock',
           'adaptive_avg_pool2d', 'interpolate_as', 'make_divisible',
           'scale_target', 'sigmoid_geometric_mean', 'gaussian2D',
           'gen_gaussian_target', 'gaussian_radius', 'get_local_maximum',
           'get_topk_from_heatmap', 'gather_feat',
           'transpose_and_gather_feat', 'point_sample', 'get_uncertainty',
           'get_uncertain_point_coords_with_randomness']
