from .coco_eval import COCOEvaluator, evaluate_coco

__all__ = ['COCOEvaluator', 'evaluate_coco']
