from .logging import get_root_logger
from .env import collect_env

__all__ = ['get_root_logger', 'collect_env']
