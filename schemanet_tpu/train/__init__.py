from .common import CheckpointManager, TrainState, epoch_schedule, make_optimizer
from .evaluator import CBEvaluation, Evaluation
from .trainer import Trainer, TrainerConfig
from .workers import WORKER_REGISTRY, LaunchArgs

__all__ = [
    "CBEvaluation",
    "CheckpointManager",
    "Evaluation",
    "LaunchArgs",
    "TrainState",
    "Trainer",
    "TrainerConfig",
    "WORKER_REGISTRY",
    "epoch_schedule",
    "make_optimizer",
]
