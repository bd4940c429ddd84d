from ginfinity_tpu.training.losses import (
    triplet_loss,
    regression_loss,
    alignment_contrastive_loss,
    AlignmentLossConfig,
)
from ginfinity_tpu.training.train import TrainState, make_train_step, EarlyStopping

__all__ = [
    "triplet_loss",
    "regression_loss",
    "alignment_contrastive_loss",
    "AlignmentLossConfig",
    "TrainState",
    "make_train_step",
    "EarlyStopping",
]
