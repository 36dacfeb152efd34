from .checkpoint import CheckpointManager, save_checkpoint, load_checkpoint
from .torch_convert import (
    convert_resnet_state_dict,
    convert_mobilenet_v2_state_dict,
    convert_lstm_cell,
)

__all__ = [
    "CheckpointManager",
    "save_checkpoint",
    "load_checkpoint",
    "convert_resnet_state_dict",
    "convert_mobilenet_v2_state_dict",
    "convert_lstm_cell",
]
