from .condinst_head import (CondInstBoxHead, CondInstMaskBranch,
                            CondInstMaskHead, CondInstSegmHead)
from .box_solov2_head import BoxSOLOv2Head

__all__ = ['CondInstBoxHead', 'CondInstMaskBranch', 'CondInstMaskHead',
           'CondInstSegmHead',
           'BoxSOLOv2Head']
