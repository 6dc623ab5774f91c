from .condinst_head import (CondInstBoxHead, CondInstMaskBranch,
                            CondInstMaskHead)

__all__ = ['CondInstBoxHead', 'CondInstMaskBranch', 'CondInstMaskHead']
