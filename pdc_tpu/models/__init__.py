from pdc_tpu.models.resnet import ResNet34_8s, ResNetFCN
from pdc_tpu.models.unet import UNet
from pdc_tpu.models.dcn import DenseCorrespondenceNetwork, build_backbone
