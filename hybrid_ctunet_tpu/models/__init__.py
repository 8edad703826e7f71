from .cunet import CUNet
from .tunet import TUNet
from .ctunet import CTUNet
from .resnet3d import ResNet3D
from .vit3d import ViT3D
