from chambers_tpu.losses.base import Loss, reduce_weighted_loss
from chambers_tpu.losses.metric_learning import (
    ContrastiveLoss,
    MultiSimilarityLoss,
    MultiSimilarityLossMatrix,
    NTXentLoss,
    PairLoss,
    PairMatrixLoss,
)
from chambers_tpu.losses.categorical import (
    BinaryCrossentropy,
    CategoricalCrossentropy,
    MeanSquaredError,
    SoftDiceLoss,
    SparseCategoricalCrossentropy,
    soft_dice_coefficient,
)
from chambers_tpu.losses.distillation import DistillationLoss
