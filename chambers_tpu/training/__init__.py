from chambers_tpu.training import lora
from chambers_tpu.training.trainer import Trainer, TrainState
