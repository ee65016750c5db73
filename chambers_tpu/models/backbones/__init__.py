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
)
