from vcrnet_tpu.train.engine import TrainState, Trainer
from vcrnet_tpu.train.optim import (
    make_optimizer,
    ReduceLROnPlateau,
    MultiStepLR,
)
from vcrnet_tpu.train.metrics import EpochAccumulator, summarize

__all__ = [
    "TrainState",
    "Trainer",
    "make_optimizer",
    "ReduceLROnPlateau",
    "MultiStepLR",
    "EpochAccumulator",
    "summarize",
]
