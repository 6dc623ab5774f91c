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
           'MultiScaleDeformableAttention']
