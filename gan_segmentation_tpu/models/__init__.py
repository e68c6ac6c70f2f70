from .stylegan import StyleGanGenerator, MappingNetwork, StyleBlock, init_generator
from .decoder import Decoder, DecoderResBlock, decoder_from_config
from .resnet import ResNetV1s, resnet50_v1s, resnet101_v1s, resnet152_v1s
from .resnext import ResNextDilated, resnext50_32x4d, resnext101_32x4d, se_resnext50_32x4d
from .deeplab import DeepLabV3, DeepLabV3Plus, ASPP, FCNHead, SeparableConv
