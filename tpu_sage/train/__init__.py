from tpu_sage.train.losses import loss_lookup
from tpu_sage.train.lr import LRSchedule
from tpu_sage.train.metrics import metric_lookup
from tpu_sage.train.trainer import TrainConfig, Trainer, TrainState, build_model, fit

__all__ = [
    "loss_lookup",
    "metric_lookup",
    "LRSchedule",
    "TrainConfig",
    "Trainer",
    "TrainState",
    "build_model",
    "fit",
]
