from chambers_tpu.models.backbones.vision_transformer import (
    DeiTB16,
    DeiTS16,
    DistilledVisionTransformer,
    ViTB16,
    ViTB32,
    ViTL16,
    ViTL32,
    ViTS16,
    VisionTransformer,
    fold_imagenet_normalization,
)
from chambers_tpu.models.backbones.senet import (
    SENet,
    SENet154,
    SEResNet50,
    SEResNet101,
    SEResNet152,
    SEResNeXt50,
    SEResNeXt101,
)
from chambers_tpu.models.backbones.resnext import ResNeXt50, ResNeXt101
from chambers_tpu.models.backbones.inception import BNInception
