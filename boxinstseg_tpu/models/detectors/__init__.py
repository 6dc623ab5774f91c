from .condinst import CondInst
from .single_stage_boxseg import BoxLevelSet, SingleStageBoxInsDetector

__all__ = ['CondInst', 'BoxLevelSet', 'SingleStageBoxInsDetector']
