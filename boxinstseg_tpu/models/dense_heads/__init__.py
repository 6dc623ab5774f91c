from .condinst_head import (CondInstBoxHead, CondInstMaskBranch,
                            CondInstMaskHead)
from .box_solov2_head import BoxSOLOv2Head

__all__ = ['CondInstBoxHead', 'CondInstMaskBranch', 'CondInstMaskHead',
           'BoxSOLOv2Head']
