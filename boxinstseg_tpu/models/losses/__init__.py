from .ae_loss import AssociativeEmbeddingLoss, ae_loss_per_image
from .focal_loss import FocalLoss, sigmoid_focal_loss
from .iou_loss import (BoundedIoULoss, CIoULoss, DIoULoss, GIoULoss,
                       IoULoss)
from .pisa_loss import carl_loss, isr_p
from .seesaw_loss import SeesawLoss, seesaw_ce_loss
from .cross_entropy_loss import CrossEntropyLoss, binary_cross_entropy_with_logits
from .dice_loss import DiceLoss, dice_coefficient
from .projection import compute_project_term, BoxProjectionLoss
from .levelset_loss import (LevelsetLoss, LocalConsistencyModule,
                            region_levelset, region_levelset_shared,
                            length_regularization, local_consistency_loss)
from .misc_losses import (GHMC, GHMR, Accuracy, BalancedL1Loss,
                          DistributionFocalLoss, GaussianFocalLoss,
                          KnowledgeDistillationKLDivLoss, L1Loss, MSELoss,
                          QualityFocalLoss, SmoothL1Loss, VarifocalLoss,
                          accuracy)

__all__ = [
    'FocalLoss', 'sigmoid_focal_loss', 'IoULoss', 'GIoULoss',
    'CrossEntropyLoss', 'binary_cross_entropy_with_logits', 'DiceLoss',
    'dice_coefficient', 'compute_project_term', 'BoxProjectionLoss',
    'LevelsetLoss', 'LocalConsistencyModule', 'region_levelset',
    'region_levelset_shared',
    'length_regularization', 'local_consistency_loss',
    'L1Loss', 'SmoothL1Loss', 'MSELoss', 'GaussianFocalLoss',
    'VarifocalLoss', 'BalancedL1Loss', 'QualityFocalLoss',
    'DistributionFocalLoss', 'KnowledgeDistillationKLDivLoss', 'GHMC',
    'GHMR', 'accuracy', 'Accuracy', 'DIoULoss', 'CIoULoss',
    'BoundedIoULoss', 'SeesawLoss', 'seesaw_ce_loss',
    'AssociativeEmbeddingLoss', 'ae_loss_per_image', 'isr_p', 'carl_loss',
]
