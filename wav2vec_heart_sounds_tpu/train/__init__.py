"""Training layer: jitted train steps, metrics, losses, evaluation, SVM probe."""

from .classifier import SupervisedTrainer, TrainState
from .evaluate import evaluate, make_apply_fn
from .losses import (
    ContrastiveFocalConfig,
    center_loss,
    contrastive_focal_loss,
    cross_entropy,
    init_contrastive_focal,
    supervised_contrastive,
)
from .metrics import ConfusionMatrix
from .optim import build_optimizer, lr_schedule
from .params import TrainingArgs, model_config, training_args
from .svm import NeuralSVM

__all__ = [
    "SupervisedTrainer",
    "TrainState",
    "evaluate",
    "make_apply_fn",
    "ConfusionMatrix",
    "ContrastiveFocalConfig",
    "contrastive_focal_loss",
    "cross_entropy",
    "center_loss",
    "supervised_contrastive",
    "init_contrastive_focal",
    "build_optimizer",
    "lr_schedule",
    "TrainingArgs",
    "model_config",
    "training_args",
    "NeuralSVM",
]
