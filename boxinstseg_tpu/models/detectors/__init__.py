from .condinst import CondInst

__all__ = ['CondInst']
