from .resnet import ResNet, ResNetV1d, ResNeXt
from .swin import SwinTransformer

__all__ = ['ResNet', 'ResNetV1d', 'ResNeXt', 'SwinTransformer']
from .pvt import (PyramidVisionTransformer,
                  PyramidVisionTransformerV2)
from .resnest import ResNeSt
from .detectors_resnet import DetectoRS_ResNet
