from .losses import cross_entropy, compute_policy_loss
from .schedulers import lr_at_epoch, ReduceLROnPlateau
from .optim import build_optimizer, OptimizerBundle
from .train_state import AdaMMLTrainState, StageFlags, STAGES

__all__ = [
    "cross_entropy",
    "compute_policy_loss",
    "lr_at_epoch",
    "ReduceLROnPlateau",
    "build_optimizer",
    "OptimizerBundle",
    "AdaMMLTrainState",
    "StageFlags",
    "STAGES",
]
