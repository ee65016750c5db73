from chambers_tpu.augmentations.image_augmentations import (
    AutoContrast,
    Brightness,
    Color,
    Contrast,
    CutOut,
    Equalize,
    ImageNetNormalization,
    Invert,
    Posterize,
    RandomChance,
    RandomChoice,
    ResizingMinMax,
    Rotate,
    Sharpness,
    ShearX,
    ShearY,
    Solarize,
    SolarizeAdd,
    TranslateX,
    TranslateY,
)
from chambers_tpu.augmentations.augmentation_schemes import AutoAugment, RandAugment

# Keras-preprocessing-layer equivalents (the reference re-exports Keras's,
# augmentations/__init__.py:1-13)
from chambers_tpu.augmentations.preprocessing import (
    CenterCrop,
    RandomContrast,
    RandomCrop,
    RandomFlip,
    RandomHeight,
    RandomRotation,
    RandomTranslation,
    RandomWidth,
    RandomZoom,
    Rescaling,
    Resizing,
)
from chambers_tpu.augmentations.batch_augmentations import (
    CutMix,
    MixUp,
    mixup_or_cutmix,
)
