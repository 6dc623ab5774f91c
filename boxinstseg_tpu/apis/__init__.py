from .train import train_detector
from .test import run_evaluation, postprocess_masks
from .inference import init_detector, inference_detector

__all__ = ['train_detector', 'run_evaluation', 'postprocess_masks',
           'init_detector', 'inference_detector']
