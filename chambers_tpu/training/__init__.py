from chambers_tpu.training.trainer import Trainer, TrainState
