from .resnet import ResNet, ResNeXt
from .swin import SwinTransformer

__all__ = ['ResNet', 'ResNeXt', 'SwinTransformer']
