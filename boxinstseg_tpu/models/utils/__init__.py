from .positional_encoding import SinePositionalEncoding
from .transformer import (FFN, DetrTransformerDecoderLayer,
                          DetrTransformerEncoderLayer,
                          MultiheadAttention, MultiScaleDeformableAttention)

__all__ = ['SinePositionalEncoding', 'FFN', 'DetrTransformerDecoderLayer',
           'DetrTransformerEncoderLayer', 'MultiheadAttention',
           'MultiScaleDeformableAttention']
